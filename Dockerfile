# Environment for dvc_tpu (reference ships a CUDA 11.7 image; the TPU
# equivalent is a Cloud TPU VM base with JAX preinstalled).
#
#   docker build -t dvc_tpu .
#   bash docker-run.sh data/ save/
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    build-essential make && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace
COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt

COPY . .
RUN make -C native

# On a TPU VM, install the matching jax[tpu] wheel instead:
#   pip install 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
CMD ["python", "-m", "pytest", "tests/", "-q"]
