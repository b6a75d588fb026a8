# TPU-VM image (parity with the reference's CUDA Dockerfile, adapted to the
# target hardware). Run on a Cloud TPU VM; jax[tpu] links against the
# VM-provided libtpu.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make libpng-dev libjpeg62-turbo-dev fonts-dejavu-core \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY simplesr_tpu ./simplesr_tpu
COPY examples ./examples
COPY scripts ./scripts
COPY tests ./tests
COPY Makefile bench.py __graft_entry__.py ./

RUN pip install --no-cache-dir -e . \
    && pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir pytest tensorboardX scikit-learn

CMD ["python", "-m", "examples.run_example", "examples/training/minimal_example.yaml"]
