"""golf_tpu: TPU-native differentiable-DSP voice synthesis framework."""

import os


def _honor_platform_env():
    """Make JAX_PLATFORMS effective even when a sitecustomize hook has
    already imported jax and registered a remote-TPU PJRT plugin (the env
    var is only read pre-import; the config flag wins afterwards)."""
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            import jax
            if jax.config.jax_platforms != plat:
                jax.config.update("jax_platforms", plat)
        except Exception:
            pass


def _enable_compile_cache():
    """Persistent XLA compilation cache: compiles through the remote-TPU
    relay cost minutes; cached reruns cost seconds."""
    try:
        import jax
        if not jax.config.jax_compilation_cache_dir:
            jax.config.update("jax_compilation_cache_dir",
                              os.path.expanduser("~/.cache/jax_comp_cache"))
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_honor_platform_env()
_enable_compile_cache()
