"""Shared CLI helpers: JAX bootstrap, weight loading, image I/O."""

import os

import numpy as np


def setup_jax(platform: str | None = None):
    """One-time JAX bootstrap for every CLI entry point.

    - Enables the persistent compile cache (/tmp/jax_cache): the axon TPU
      tunnel's server-side compiles take minutes cold, sub-second warm.
    - Optionally pins the platform ("cpu"/"tpu").  The axon plugin IGNORES
      the JAX_PLATFORMS env var, so honour our own VST_PLATFORM env (or the
      explicit argument) through jax.config, which works when applied
      before first backend use.
    """
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("VST_COMPILE_CACHE",
                                         "/tmp/jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    platform = platform or os.environ.get("VST_PLATFORM")
    if platform:
        try:
            jax.config.update("jax_platforms", platform)
        except Exception as e:
            import sys

            print(f"warning: failed to pin JAX platform '{platform}' "
                  f"({e}); running on "
                  f"{jax.default_backend()}", file=sys.stderr)


def load_image_255(path, size_wh=None):
    from vst_tpu.data.datasets import load_image

    return load_image(path, size_wh)


def save_image_255(arr, path):
    from PIL import Image

    Image.fromarray(np.clip(np.asarray(arr), 0, 255).astype(np.uint8)).save(path)


MODEL_INIT = {
    "reconet": ("vst_tpu.models.reconet", "init_reconet"),
    "sd1": ("vst_tpu.models.reconet", "init_reconet_sd1"),
    "sd2": ("vst_tpu.models.reconet", "init_reconet_sd2"),
    "rtnstv": ("vst_tpu.models.rtnstv", "init_stylizing_network"),
    "adaattn": ("vst_tpu.models.adaattn", "init_stylizing_network"),
}


def check_weights_match(params: dict, model: str, path: str) -> None:
    """Fail fast with a readable message when a checkpoint doesn't belong to
    the requested model family."""
    import importlib

    mod_name, fn_name = MODEL_INIT[model]
    expected = set(getattr(importlib.import_module(mod_name), fn_name)(0))
    got = set(params)
    if not expected <= got:
        missing = sorted(expected - got)[:3]
        raise SystemExit(
            f"error: {path} does not look like a '{model}' checkpoint "
            f"(missing keys e.g. {missing}); pass the matching --model")


def load_weights(path: str) -> dict:
    """Load params from .npz (native) or .pth (reference/torchvision)."""
    if path.endswith(".npz"):
        from vst_tpu.train.checkpoint import load_params

        return load_params(path)
    if path.endswith((".pth", ".pt")):
        from vst_tpu.compat import load_pth

        return load_pth(path)
    raise ValueError(f"unsupported weight format: {path}")


def load_vgg_weights(path: str | None, flavor: str, seed: int = 0) -> dict:
    """VGG weights from file, or random init (smoke runs) when None.

    flavor: "vgg16" | "vgg19_rtnstv" | "vgg19_adaattn".
    """
    from vst_tpu.models import vgg

    init = {
        "vgg16": vgg.init_vgg16_reconet,
        "vgg19_rtnstv": vgg.init_vgg19_rtnstv,
        "vgg19_adaattn": vgg.init_vgg19_adaattn,
    }[flavor]
    if path is None:
        return init(seed)
    weights = load_weights(path)
    expected = init(seed)
    return {k: weights[k] for k in expected}
