# fabstir-vectordb-tpu REST server image.
# Deployment parity with the reference's Dockerfile/Dockerfile.production;
# the TPU runtime (libtpu) is expected from the base image on TPU VMs.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY fabstir_vectordb_tpu ./fabstir_vectordb_tpu

RUN pip install --no-cache-dir "jax[cpu]" numpy aiohttp requests \
        zstandard cryptography \
    && pip install --no-cache-dir -e .

# Pre-build the native runtime library.
RUN python -c "from fabstir_vectordb_tpu.native import load_library; load_library()"

ENV VECTOR_DB_HOST=0.0.0.0 \
    VECTOR_DB_PORT=7533 \
    STORAGE_MODE=fs \
    FS_STORAGE_ROOT=/data

VOLUME /data
EXPOSE 7533

CMD ["python", "-m", "fabstir_vectordb_tpu.api.server"]
