# Pinned runtime environment for vslam_tpu.
#
# Role of the reference's 3-stage ROS Dockerfile (reference Dockerfile:1-96):
# there is no ROS runtime to reproduce here, so one stage pins the Python/JAX
# stack, builds the native IO helpers, and installs the package with its CLI
# entry points. For TPU VMs swap the jax extra for `jax[tpu]` (same pins) —
# the default target runs the full test suite on a virtual 8-device CPU mesh.
#
# Build:  docker build -t vslam-tpu .
# Test:   docker run --rm vslam-tpu
# Run:    docker run --rm vslam-tpu vslam-run synthetic --frames 12

FROM python:3.12-slim AS runtime

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make zlib1g-dev \
    && rm -rf /var/lib/apt/lists/*

# the stack the framework is developed and benchmarked against
RUN pip install --no-cache-dir \
        "jax==0.9.0" "jaxlib==0.9.0" \
        "numpy==2.0.2" "scipy==1.17.0" \
        "pillow==12.1.0" "PyYAML==6.0.3" "matplotlib==3.10.8" \
        "einops==0.8.2" "chex==0.1.91" \
        "pytest==8.4.2"

WORKDIR /opt/vslam_tpu
COPY . .

# native IO helpers (threaded PNG prefetch ring; io/native bindings)
RUN make -C native

RUN pip install --no-cache-dir -e .

# default: prove the install — full suite on a virtual 8-device CPU mesh
ENV XLA_FLAGS=--xla_force_host_platform_device_count=8
CMD ["python", "-m", "pytest", "tests/", "-q"]
