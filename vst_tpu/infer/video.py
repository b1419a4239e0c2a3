"""Streaming video stylization.

Parity targets: the ReCoNet ``Inference`` iterator
(ReCoNet/utilities.py:179-236 — sliding window of ``input_frame_num``
channel-concatenated frames, clamp, BGR uint8 out) and the AdaAttN video
loop (AdaAttN/infer_video.py:30-88 — style features precomputed once).

TPU-first changes vs the reference's per-frame host↔device round trip:
- frames are batched (``batch_size`` windows stylized per device call);
- host decode runs in a reader thread feeding a bounded queue;
- ``jax.device_put`` is async, double-buffering transfers against compute.

Frame sources are any iterator of HWC RGB uint8/float arrays;
``frames_from_video`` adapts a video file via cv2 when available.
"""

import collections
from queue import Queue
from threading import Thread

import numpy as np


def frames_from_video(path, resize_wh=None, interpolation="linear",
                      dtype="float32"):
    """Yield HWC RGB frames from a video file (requires cv2).

    interpolation: "linear" (ReCoNet cvframe_to_tensor,
    ReCoNet/utilities.py:119-123) or "area" (AdaAttN cv2_to_tensor,
    AdaAttN/utilities.py:46-55).

    dtype: "float32" or "uint8".  uint8 keeps the decoder's native byte
    frames so the host→device transfer ships 1 byte/channel — the jitted
    stylizers cast to the compute dtype on device.
    """
    import cv2

    interp = {"linear": cv2.INTER_LINEAR, "area": cv2.INTER_AREA}[interpolation]
    cap = cv2.VideoCapture(path)
    try:
        while True:
            ret, frame = cap.read()
            if not ret:
                return
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            if resize_wh is not None and frame.shape[1::-1] != tuple(resize_wh):
                frame = cv2.resize(frame, tuple(resize_wh), interpolation=interp)
            yield frame if dtype == "uint8" else frame.astype(np.float32)
    finally:
        cap.release()


def video_fps(path) -> float:
    import cv2

    cap = cv2.VideoCapture(path)
    fps = cap.get(cv2.CAP_PROP_FPS)
    cap.release()
    return fps


def _reader(frames, queue):
    for f in frames:
        queue.put(f)
    queue.put(None)


class StreamingStylizer:
    """Batched sliding-window streaming stylizer.

    ``model_fn(batch) -> styled`` maps (B, H, W, 3·input_frame_num) 0–255
    windows to (B, H, W, 3) clamped 0–255 frames (e.g. a jitted
    ``stylize_reconet``/``stylize_rtnstv`` closure).

    ``first_frame``: skip initial frames so output starts at that index
    (ReCoNet/utilities.py:193-201 semantics).

    ``pipeline_depth``: number of batches kept in flight on the device
    before the oldest result is materialized to host.  JAX dispatch is
    async, so when ``model_fn`` returns device arrays (any jitted
    closure), dispatching batch k+1..k+depth before fetching batch k
    overlaps host decode, host→device transfer, device compute and
    device→host fetch — and amortizes fixed per-call dispatch latency
    (large over a remote-TPU tunnel) across ``depth`` batches.

    ``wire="i420"``: ``model_fn`` returns device-packed I420
    (``ops.yuv.rgb_to_i420`` of the styled frames, (B, H·3/2, W) uint8);
    frames cross the device→host link at 1.5 B/px instead of 3 — double
    the throughput ceiling on a link-bound tunnel — and are converted
    back with one cv2.cvtColor per frame here.  The conversion is
    bit-exact cv2 COLOR_RGB2YUV_I420, i.e. exactly what a YUV420 video
    encode would do to the frame anyway.
    """

    def __init__(self, model_fn, frames, input_frame_num: int = 1,
                 batch_size: int = 4, first_frame: int | None = None,
                 output: str = "rgb_uint8", pipeline_depth: int = 3,
                 wire: str = "rgb"):
        self.model_fn = model_fn
        self.frames = iter(frames)
        self.input_frame_num = input_frame_num
        self.batch_size = batch_size
        self.output = output
        self.wire = wire
        self.pipeline_depth = max(1, pipeline_depth)
        if first_frame is None or first_frame < input_frame_num:
            first_frame = input_frame_num
        self.skip = first_frame - input_frame_num

    def __iter__(self):
        queue = Queue(maxsize=2 * self.batch_size + 4)
        Thread(target=_reader, args=(self.frames, queue), daemon=True).start()

        for _ in range(self.skip):
            if queue.get() is None:
                return

        window = collections.deque(maxlen=self.input_frame_num)
        for _ in range(self.input_frame_num):
            frame = queue.get()
            if frame is None:
                return
            window.append(frame)

        inflight = collections.deque()  # (device_result, n_real) FIFO
        done = False
        while not done:
            batch = [np.concatenate(list(window), axis=-1)]
            while len(batch) < self.batch_size:
                frame = queue.get()
                if frame is None:
                    done = True
                    break
                window.append(frame)
                batch.append(np.concatenate(list(window), axis=-1))
            # Pad the tail batch to batch_size so the jitted model_fn sees ONE
            # shape for the whole run (a smaller final batch would trigger a
            # fresh XLA compile — tens of seconds over the TPU tunnel).
            n_real = len(batch)
            if n_real < self.batch_size:
                batch = batch + [batch[-1]] * (self.batch_size - n_real)
            inflight.append((self.model_fn(np.stack(batch)), n_real))
            while len(inflight) >= self.pipeline_depth:
                yield from self._materialize(inflight.popleft())
            if not done:
                frame = queue.get()
                if frame is None:
                    done = True
                else:
                    window.append(frame)
        while inflight:
            yield from self._materialize(inflight.popleft())

    def _materialize(self, entry):
        result, n_real = entry
        for out in np.asarray(result)[:n_real]:
            yield self._convert(out)

    def _convert(self, frame):
        if self.wire == "i420":
            from vst_tpu.ops.yuv import i420_to_rgb

            order = "bgr" if self.output == "bgr_uint8" else "rgb"
            return i420_to_rgb(frame, order)
        if self.output == "rgb_uint8":
            return frame.astype(np.uint8)
        if self.output == "bgr_uint8":
            return frame.astype(np.uint8)[..., ::-1]
        return frame


class AdaAttNVideoStylizer:
    """Arbitrary-style streaming stylizer: style features encoded ONCE, each
    content frame encoded + stylized (AdaAttN/infer_video.py:40-64).

    Frames may be uint8 or float 0–255 (cast on device); styled frames come
    back as uint8 device arrays, and up to ``pipeline_depth`` batches are
    kept in flight (see StreamingStylizer).

    ``mesh``: optional 1-D ``jax.sharding.Mesh`` with a "data" axis —
    params/style-state replicate and each content batch's frame dim shards
    across it (frames are independent: pure throughput scaling, zero
    collectives).  ``batch_size`` must divide evenly."""

    def __init__(self, vgg_params, params, style_255, activation="cosine",
                 batch_size: int = 2, pipeline_depth: int = 3,
                 wire: str = "rgb", mesh=None):
        import functools

        import jax
        import jax.numpy as jnp

        from vst_tpu.models import adaattn as adaattn_m
        from vst_tpu.models import vgg as vgg_m

        self.batch_size = batch_size
        self.pipeline_depth = max(1, pipeline_depth)
        self.wire = wire
        fs_single = jax.jit(vgg_m.vgg19_adaattn_features)(vgg_params, style_255)
        # style side computed ONCE per clip: downsample pyramid, IN, g/h
        # 1×1 convs and (cosine) the K̂ᵀV moment matmuls are loop-invariant
        # (the reference reruns them per frame, AdaAttN/infer_video.py:56-60)
        state = jax.jit(
            lambda p, fs: adaattn_m.style_state(p, fs, activation)
        )(params, fs_single)

        @jax.jit
        def run(vgg_params, params, content, state):
            fc = vgg_m.vgg19_adaattn_features(vgg_params,
                                              content.astype(jnp.float32))
            cs = adaattn_m.stylizing_network_cached(params, fc, state,
                                                    activation)
            cs = jnp.clip(cs, 0, 255)
            if wire == "i420":  # 1.5 B/px down-link (see StreamingStylizer)
                from vst_tpu.ops.yuv import rgb_to_i420

                return rgb_to_i420(cs)
            return cs.astype(jnp.uint8)

        if mesh is None:
            self._run = lambda content: run(vgg_params, params, content,
                                            state)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            if batch_size % mesh.devices.size:
                raise ValueError(
                    f"batch_size {batch_size} must be divisible by the "
                    f"{mesh.devices.size}-device mesh")
            rep = NamedSharding(mesh, P())
            vgg_params = jax.device_put(vgg_params, rep)
            params = jax.device_put(params, rep)
            state = jax.device_put(state, rep)
            bspec = NamedSharding(mesh, P("data"))
            self._run = lambda content: run(
                vgg_params, params, jax.device_put(content, bspec), state)

    def stylize_frames(self, frames):
        """frames: iterator of HWC RGB uint8/float 0–255 → RGB uint8."""
        inflight = collections.deque()  # (device_result, n_real) FIFO

        def drain_one():
            result, n_real = inflight.popleft()
            frames_np = np.asarray(result)[:n_real]
            if self.wire == "i420":
                from vst_tpu.ops.yuv import i420_to_rgb

                for f in frames_np:
                    yield i420_to_rgb(f)
            else:
                yield from frames_np

        batch = []
        for frame in frames:
            batch.append(frame)
            if len(batch) == self.batch_size:
                inflight.append((self._run(np.stack(batch)),
                                 self.batch_size))
                batch = []
                while len(inflight) >= self.pipeline_depth:
                    yield from drain_one()
        if batch:
            # pad tail to batch_size: keeps one compiled shape per run
            n_real = len(batch)
            batch = batch + [batch[-1]] * (self.batch_size - n_real)
            inflight.append((self._run(np.stack(batch)), n_real))
        while inflight:
            yield from drain_one()


def write_video(path, frames, fps: float = 30.0):
    """Encode RGB uint8 frames to a video file (imageio when an ffmpeg
    backend is present — AdaAttN infer_video.py:79-88 — else cv2).

    ``frames`` is consumed as a STREAM: one frame is held at a time, so
    arbitrarily long clips encode in bounded memory (the reference buffers
    the whole clip in a list, AdaAttN/infer_video.py:63,86)."""
    frames = iter(frames)
    try:
        first = next(frames)
    except StopIteration:
        return
    writer = None
    try:
        import imageio

        writer = imageio.get_writer(path, fps=fps)
    except Exception:
        writer = None
    if writer is not None:
        with writer:
            writer.append_data(first)
            for f in frames:
                writer.append_data(f)
        return
    import cv2

    h, w = first.shape[:2]
    fourcc = cv2.VideoWriter_fourcc(
        *("mp4v" if path.lower().endswith(".mp4") else "MJPG"))
    vw = cv2.VideoWriter(path, fourcc, fps, (w, h))
    if not vw.isOpened():  # codec fallback
        path = path.rsplit(".", 1)[0] + ".avi"
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"),
                             fps, (w, h))
    if not vw.isOpened():
        raise IOError(f"cannot open a video writer for {path} "
                      "(missing directory or unsupported codec?)")
    vw.write(cv2.cvtColor(first, cv2.COLOR_RGB2BGR))
    for f in frames:
        vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    vw.release()


class StreamingVideoWriter:
    """Background-thread encoder with a bounded queue: each frame is handed
    off and encoded WHILE later batches are in flight on the device, instead
    of (a) buffering the whole clip in host memory or (b) stalling the
    device drain on cv2/ffmpeg encode time."""

    def __init__(self, path, fps: float = 30.0, queue_size: int = 32):
        self.queue = Queue(maxsize=queue_size)
        self.error = None

        def drain():
            while True:
                item = self.queue.get()
                if item is None:  # sentinel ('is', not '==': numpy frames)
                    return
                yield item

        def run():
            try:
                write_video(path, drain(), fps)
            except Exception as e:  # surfaced on put()/close()
                self.error = e
                while self.queue.get() is not None:  # unblock the producer
                    pass

        self.thread = Thread(target=run, daemon=True)
        self.thread.start()

    def put(self, frame):
        if self.error:
            raise self.error
        self.queue.put(frame)

    def close(self):
        self.queue.put(None)
        self.thread.join()
        if self.error:
            raise self.error

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def frames_from_source(path, resize_wh=None, interpolation="linear",
                       dtype="uint8", batch_size: int = 8,
                       num_threads: int = 8):
    """Best available frame source: the native thread-pool MJPG decoder
    (native/vstvideo.cc — decodes batches of JPEG frames across cores)
    when the file is an MJPG AVI and the library is built, else cv2."""
    from vst_tpu.data.video_native import open_video

    native = open_video(path, num_threads) if dtype == "uint8" else None
    if native is not None:
        return native.frames(batch_size, resize_wh, interpolation)
    return frames_from_video(path, resize_wh, interpolation, dtype)
