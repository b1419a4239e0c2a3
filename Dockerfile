# vst_tpu — TPU-native video style transfer framework.
#
# Mirrors the role of the reference's Dockerfile (Dockerfile:1-31: Ubuntu
# 24.04 + conda + torch-cu124 + opencv-contrib), re-targeted at TPU hosts:
# JAX with the TPU PJRT plugin is the compute stack; torch stays CPU-only
# for .pth checkpoint interop and test oracles.
#
# Build:  docker build -t vst-tpu .
# Run  :  docker run --privileged --network host \
#           -v /path/to/datasets:/root/datasets vst-tpu
# (TPU VMs expose the accelerator to privileged containers; on GKE use the
# tpu resource requests instead of --privileged.)

FROM ubuntu:24.04

RUN apt-get update && apt-get install -y --no-install-recommends \
        python3 python3-pip python3-venv \
        build-essential libjpeg-dev ffmpeg \
    && rm -rf /var/lib/apt/lists/*

RUN python3 -m venv /opt/venv
ENV PATH=/opt/venv/bin:$PATH

# TPU runtime + numerics stack; torch CPU wheels only (checkpoint interop)
RUN pip install --no-cache-dir \
        "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        optax orbax-checkpoint pillow scipy matplotlib imageio imageio-ffmpeg \
        opencv-contrib-python-headless pytest \
    && pip install --no-cache-dir torch --index-url https://download.pytorch.org/whl/cpu

WORKDIR /root/vst_tpu
COPY . .

# native helpers: flow-file decoder + MJPG thread-pool decoder
RUN make -C native

RUN pip install --no-cache-dir -e .

CMD ["python", "-m", "pytest", "tests/", "-q", "-m", "not slow"]
