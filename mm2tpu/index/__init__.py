from .sketch import sketch, SEQ_NT4, encode_nt4
from .build import MMIndex, build_index, IndexOptions
