# ============================================================
# jaxmarl_hft_tpu container image
# ============================================================
# Containerised reproduction path (parity surface: the reference's
# Dockerfile / Dockerfile_GB10, which target NVIDIA CUDA images — here the
# target is TPU).
#
# On Cloud TPU VMs the runtime is host-native, so the PRIMARY launch path
# remains scripts/setup_tpu_vm.sh (no container needed). This image covers
# the two cases where a container is still the right tool:
#   * CPU-only reproduction of the full test suite / trainers anywhere
#     (default build);
#   * TPU execution from inside a container on a TPU VM: build with
#     --build-arg JAX_EXTRA=tpu and run with the TPU device passthrough
#     documented below.
#
# Build:
#   docker build -t jaxmarl-hft-tpu .                      # CPU-only
#   docker build --build-arg JAX_EXTRA=tpu -t jaxmarl-hft-tpu .   # TPU VM
#
# Run (CPU repro: full test suite on the 8-device virtual mesh):
#   docker run --rm jaxmarl-hft-tpu make test
#
# Run (on a TPU VM; the TPU runtime needs privileged device access):
#   docker run --rm --privileged --net=host \
#       -e PJRT_DEVICE=TPU \
#       -v /path/to/rawLOBSTER:/workspace/data \
#       jaxmarl-hft-tpu \
#       python scripts/train.py --env-config configs/2_player_realistic.json \
#           --rl-config configs/ippo_2player.yaml
#
# LOBSTER data (optional — synthetic configs need none) mounts at
# /workspace/data; pass dataPath/alphatradePath via env-config overrides.
# ============================================================

FROM python:3.12-slim

# native toolchain for the C++ LOBSTER CSV parser (data/native/)
RUN apt-get update \
    && apt-get install -y --no-install-recommends g++ make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace

# JAX_EXTRA=tpu installs the libtpu-bundled jax pin (requirements_tpu.txt)
ARG JAX_EXTRA=cpu

COPY requirements.txt requirements_tpu.txt ./
RUN if [ "$JAX_EXTRA" = "tpu" ]; then \
        pip install --no-cache-dir -r requirements_tpu.txt; \
    else \
        pip install --no-cache-dir -r requirements.txt; \
    fi \
    && pip install --no-cache-dir pytest pyyaml matplotlib

COPY . .
RUN pip install --no-cache-dir -e . \
    && python -c "from jaxmarl_hft_tpu.data import native_csv; \
                  print(native_csv.build(force=True))"

# tests default to the 8-virtual-device CPU mesh (tests/conftest.py)
CMD ["python", "-m", "pytest", "tests/", "-q"]
