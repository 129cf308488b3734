"""kart-tpu: a TPU-native NGS read aligner with the capabilities of Kart.

Built from scratch for JAX/XLA/Pallas on TPU; see SURVEY.md for the layer
map of the reference aligner this reimplements.
"""

__version__ = "0.1.0"

import os as _os


def _setup_jax_cache():
    """Persistent XLA compilation cache so repeated CLI runs skip the
    ~1 min TPU compile of the seeding kernels."""
    try:
        import jax

        cache_dir = _os.environ.get(
            "KART_TPU_JAX_CACHE", _os.path.expanduser("~/.cache/kart_tpu_jax")
        )
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_setup_jax_cache()
