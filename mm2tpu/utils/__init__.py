from .hashing import hash64, hash64_array, wang_hash32, x31_hash_string, ilog2_32
