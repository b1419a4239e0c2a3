"""Training subsystem (layer L5): typed configs, train states, jitted steps,
checkpointing — replacing the reference's per-script constant blocks and
manual-resume workflow (SURVEY.md §5.4, §5.6)."""

from vst_tpu.train import config, state, steps, checkpoint

__all__ = ["config", "state", "steps", "checkpoint"]
