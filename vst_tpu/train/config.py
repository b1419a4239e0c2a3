"""Typed training configs.

One dataclass per trainer family, with defaults copied from the reference
scripts' module-level constant blocks (the reference switches runs by editing
those constants — SURVEY.md §5.6):

- ReCoNet flow trainers: ReCoNet/train_single/train_candy.py:19-29
  (starry-night variant differs in epochs/beta; noFTL drops the feature
  temporal loss, train_Flow_noFTL.py; multi-frame sets input_frame_num=4,
  train_multiple/train_Flow.py:22).
- ReCoNet COCO (image-only): train_single/train_coco2014.py:19-25.
- Distillation SD1/SD2: train_single/train_Flow_SD1.py:19-30.
- RTNSTV: RTNSTV/train.py:21-33.
- AdaAttN image/video: AdaAttN/train_image.py:16-22, train_video.py:16-23.

``img_size`` is (H, W) everywhere in this framework (the reference mixes
(W, H) PIL conventions).
"""

import dataclasses


@dataclasses.dataclass(frozen=True)
class ReCoNetFlowConfig:
    """Full ReCoNet objective with temporal losses."""
    lr: float = 1e-3
    alpha: float = 1e5          # content
    beta: float = 2e10          # style
    gamma: float = 1e-2         # total-variation (raw sum)
    lambda_f: float = 1e12      # feature temporal
    lambda_o: float = 1e7       # output temporal
    batch_size: int = 2
    epochs: int = 3
    input_frame_num: int = 1
    img_size: tuple[int, int] = (360, 640)
    use_ftl: bool = True
    dtype: str = "float32"
    remat: bool = False     # jax.checkpoint the stylizer+VGG forwards


RECONET_CANDY = ReCoNetFlowConfig()
RECONET_STARRY_NIGHT = ReCoNetFlowConfig(beta=1e11, epochs=6)
RECONET_NOFTL = ReCoNetFlowConfig(beta=1e10, epochs=2, use_ftl=False)
RECONET_MULTIFRAME = ReCoNetFlowConfig(input_frame_num=4, epochs=10)


@dataclasses.dataclass(frozen=True)
class ReCoNetCocoConfig:
    """Image-only (content+style) ReCoNet training."""
    lr: float = 1e-3
    alpha: float = 1e5
    beta: float = 1e10
    batch_size: int = 4
    epochs: int = 10
    img_size: tuple[int, int] = (256, 256)
    dtype: str = "float32"
    remat: bool = False


@dataclasses.dataclass(frozen=True)
class ReCoNetDistillConfig:
    """Teacher→student knowledge distillation (SD1 / SD2 stages).

    The symmetric distillation loss is computed and logged but EXCLUDED from
    the total, exactly as the reference does (train_Flow_SD1.py:155-162);
    set ``include_sd_in_total=True`` to opt in.

    ``teacher`` / ``student`` ∈ {"reconet", "sd1", "sd2"};
    tap indices select which forward-output element feeds the SD loss
    (teacher ReCoNet→[0], SD1→[0]; student SD1→[1], SD2→[0] — see
    train_Flow_SD1.py:83-86 / train_Flow_SD2.py:83-86).  Note: the
    reference's SD1 stage compares a 96-channel teacher tap with a
    64-channel student tap, which cannot broadcast; our step skips the SD
    term when shapes mismatch and reports it as NaN.
    """
    teacher: str = "reconet"
    student: str = "sd1"
    teacher_tap: int = 0
    student_tap: int = 1
    lr: float = 1e-3
    alpha: float = 1e5
    beta: float = 1e10
    gamma: float = 1e-2
    lambda_f: float = 1e11
    lambda_o: float = 1e7
    sd_weight_scale: float = 0.01   # sd_loss *= sd_weight_scale * beta
    include_sd_in_total: bool = False
    batch_size: int = 2
    epochs: int = 20
    input_frame_num: int = 1
    img_size: tuple[int, int] = (360, 640)
    dtype: str = "float32"
    remat: bool = False


DISTILL_SD1 = ReCoNetDistillConfig()
DISTILL_SD2 = ReCoNetDistillConfig(
    teacher="sd1", student="sd2", teacher_tap=0, student_tap=0, epochs=10)


@dataclasses.dataclass(frozen=True)
class RTNSTVConfig:
    lr: float = 1e-3
    alpha: float = 1e7          # content
    beta: float = 5e7           # style
    gamma: float = 5e-1         # sqrt-TV
    lam: float = 1e6            # temporal
    batch_size: int = 2
    epochs: int = 10
    img_size: tuple[int, int] = (360, 640)
    dtype: str = "float32"
    remat: bool = False


@dataclasses.dataclass(frozen=True)
class AdaAttNImageConfig:
    lr: float = 1e-4
    lambda_g: float = 10.0
    lambda_l: float = 3.0
    batch_size: int = 8
    epochs: int = 10
    activation: str = "softmax"
    crop_size: tuple[int, int] = (256, 256)
    dtype: str = "float32"
    remat: bool = False
    # attention evaluation strategy for BOTH the stylizer and the no-conv
    # loss targets: "train" (threshold-dispatched, see
    # models/adaattn.py::attention_moments), "exact", or "pallas"
    # (flash-VJP kernel) — benchmarked in BENCH.md "AdaAttN training"
    attention_mode: str = "train"


@dataclasses.dataclass(frozen=True)
class AdaAttNVideoConfig:
    lr: float = 1e-4
    lambda_g: float = 10.0
    lambda_l: float = 3.0
    lambda_is: float = 100.0
    batch_size: int = 4
    epochs: int = 10
    activation: str = "cosine"
    frame_size: tuple[int, int] = (256, 512)
    dtype: str = "float32"
    remat: bool = False
    attention_mode: str = "train"
