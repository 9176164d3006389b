"""krakenuniq_tpu — a TPU-native metagenomics classifier with KrakenUniq's capabilities.

A ground-up JAX/XLA/Pallas re-design of the KrakenUniq workload
(reference: fbreitwieser/krakenuniq): exact k-mer classification against a
sorted (k-mer -> LCA taxid) database with per-taxon unique-k-mer counting via
HyperLogLog++.

Design stance (TPU-first):
  * The database is a static, read-only sorted tensor -- treated like model
    weights: resident in HBM, minimizer-range sharded over a device mesh.
  * Reads stream through a single jit'd program: 2-bit encode -> canonical
    k-mers -> scrambled-minimizer bin lookup -> binary search -> tree
    resolution (Euler-interval ancestor matmul on the MXU).
  * Host keeps only text I/O and byte-exact report formatting.

The k-mer keys are up to 62 bits; we enable jax x64 globally so uint64
device arrays work (XLA emulates 64-bit integer ops on TPU with 32-bit
pairs; hot Pallas kernels use explicit u32 hi/lo planes instead).
"""

import os as _os

import jax

jax.config.update("jax_enable_x64", True)

# persistent compilation cache: compiles of the (large) classify program are
# expensive, especially through remote-compile transports; cache them across
# processes
_cache_dir = _os.environ.get(
    "KRAKENUNIQ_TPU_CACHE", _os.path.expanduser("~/.cache/krakenuniq_tpu_xla")
)
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    # threshold 0: through remote-compile transports even sub-second compiles
    # cost ~0.4s each; the report path alone has a dozen small programs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:  # cache is an optimization only
    pass

__version__ = "0.1.0"
