# ragmeup_tpu server image (parity with the reference's server/Dockerfile,
# minus gunicorn/postgres: the framework is single-process and in-process).
# For TPU hosts, base this on a jax[tpu]-enabled image instead.
FROM python:3.11-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY ragmeup_tpu ./ragmeup_tpu
COPY scripts ./scripts
COPY bench.py ./

RUN pip install --no-cache-dir \
        jax flax optax numpy einops werkzeug requests lxml \
        beautifulsoup4 safetensors tokenizers scipy pytest \
    && make -C ragmeup_tpu/native

RUN useradd -m raguser
USER raguser
EXPOSE 5000

CMD ["python", "-m", "ragmeup_tpu.server", "--host", "0.0.0.0", "--port", "5000"]
