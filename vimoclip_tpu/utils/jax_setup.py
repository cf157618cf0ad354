"""Process-level JAX runtime setup shared by the CLIs.

``enable_compilation_cache`` turns on JAX's persistent compilation cache so
repeat invocations of any CLI skip recompiling unchanged programs — on
TPU-attached hosts a full train step can take minutes to compile (the
rig's tunnel, but also cold pods), and the pipeline's CLIs are run many
times over the same program shapes (sweeps, resumes, sharded extraction
jobs). bench.py has always done this for the driver; this extends the same
behavior to the user-facing entry points.

Environment knobs:
- ``VIMO_JAX_CACHE_DIR``: cache location (default
  ``~/.cache/vimoclip_tpu/jax``; falls back to a tmp dir if unwritable).
- ``VIMO_JAX_CACHE=0``: disable entirely.
- ``VIMO_JAX_PLATFORMS``: pin the JAX platform list (e.g. ``cpu``) at the
  CONFIG level for any CLI run as a subprocess. Needed because some images
  pin ``jax_platforms`` in the jax config itself, where the plain
  ``JAX_PLATFORMS`` env var is silently ignored — a CPU smoke run of a CLI
  on a TPU-attached host (or a test driving a daemon subprocess) has no
  other hook.
"""

from __future__ import annotations

import os
import tempfile


def apply_platform_env() -> None:
    """Honor ``VIMO_JAX_PLATFORMS`` (no-op when unset)."""
    platforms = os.environ.get("VIMO_JAX_PLATFORMS")
    if not platforms:
        return
    os.environ["JAX_PLATFORMS"] = platforms
    import jax

    jax.config.update("jax_platforms", platforms)


def enable_compilation_cache() -> str | None:
    """Point JAX at a persistent compilation cache; returns the dir used
    (None when disabled or unsupported by the jax version). Also applies
    the ``VIMO_JAX_PLATFORMS`` pin — every CLI routes through here before
    touching a device."""
    apply_platform_env()
    if os.environ.get("VIMO_JAX_CACHE", "1") == "0":
        return None
    cache_dir = os.environ.get("VIMO_JAX_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "vimoclip_tpu", "jax"
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        probe = os.path.join(cache_dir, ".probe")
        with open(probe, "w"):
            pass
        os.remove(probe)
    except OSError:
        cache_dir = os.path.join(tempfile.gettempdir(), "vimoclip_jax_cache")
        os.makedirs(cache_dir, exist_ok=True)
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return None
    return cache_dir
