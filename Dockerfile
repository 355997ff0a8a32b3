# Runtime image for tpu_vo (CPU execution; on TPU VMs install the matching
# jax[tpu] wheel instead). Mirrors the reference's containerized delivery
# (its Dockerfile shipped a GUI stack; tpu_vo is headless by design, with
# file-based visualization outputs).
FROM debian:bookworm-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        python3 python3-pip python3-venv \
        build-essential cmake ninja-build \
        libpng-dev libjpeg62-turbo-dev zlib1g-dev \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace
COPY . /workspace

RUN python3 -m venv /opt/venv \
    && /opt/venv/bin/pip install --upgrade pip \
    && /opt/venv/bin/pip install "jax[cpu]" numpy pillow pytest \
    && /opt/venv/bin/pip install -e . --no-deps --no-build-isolation
ENV PATH=/opt/venv/bin:$PATH

RUN make native

# Mount datasets at /workspace/data (the CLI autodetects data/Dataset_VO).
VOLUME ["/workspace/data", "/workspace/results"]

ENTRYPOINT ["python3", "-m", "tpu_vo.cli"]
