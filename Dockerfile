# Open Speech TPU server image.
#
# Build args mirror the reference's baking knobs (reference: Dockerfile:18-19):
#   BAKED_STT_MODELS / BAKED_TTS_MODELS — model ids to prefetch into the image
FROM python:3.12-slim AS base

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make ffmpeg openssl espeak-ng \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY open_speech_tpu ./open_speech_tpu
COPY native ./native
COPY client-js ./client-js

# TPU wheels: for real TPU hosts install jax[tpu]; CPU wheel otherwise
ARG JAX_VARIANT=jax[tpu]
RUN pip install --no-cache-dir -e . && \
    pip install --no-cache-dir "${JAX_VARIANT}" \
      -f https://storage.googleapis.com/jax-releases/libtpu_releases.html || \
    pip install --no-cache-dir jax

RUN make -C native

# Optional weight prefetch layer (reference: Dockerfile:100-125)
ARG BAKED_STT_MODELS=""
ARG BAKED_TTS_MODELS=""
RUN if [ -n "$BAKED_STT_MODELS" ]; then \
      python -c "import os; from huggingface_hub import snapshot_download; \
[snapshot_download(m) for m in os.environ.get('BAKED','').split(',') if m]" \
      BAKED="$BAKED_STT_MODELS"; fi

# non-root runtime (reference: docker-entrypoint.sh ownership fix)
RUN useradd -m -u 1000 openspeech && \
    mkdir -p /home/openspeech/data && chown -R openspeech /home/openspeech
USER openspeech
ENV OS_HOST=0.0.0.0 OS_PORT=8100 OS_SSL_ENABLED=false

EXPOSE 8100 10400
HEALTHCHECK --interval=30s --timeout=5s \
  CMD python -c "import urllib.request,os; \
urllib.request.urlopen(f'http://localhost:{os.environ.get(\"OS_PORT\",8100)}/health')"

CMD ["python", "-m", "open_speech_tpu.server"]
