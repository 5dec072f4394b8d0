"""Persistent XLA compilation cache setup.

The reference amortizes its 'compile' cost by shipping a prebuilt FPGA
bitstream (bin/*.awsxclbin, SURVEY §2.1 'Prebuilt bitstream'); the XLA
equivalent is the persistent compilation cache, which turns the 20-40 s
first-compile of each Pallas kernel shape into a millisecond disk load in
every later process. Enabled by the CLI and bench before first jit."""
from __future__ import annotations

import os

_DONE = False


def enable(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    cache_dir = (cache_dir or os.environ.get("MM2TPU_JAX_CACHE") or
                 os.path.join(os.path.expanduser("~"), ".cache",
                              "mm2tpu", "jax"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization only; never fail the run
