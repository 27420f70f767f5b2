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


_honor_platform_env()
