#!/bin/sh
# Entrypoint: fix data-dir ownership when mounted as root, then drop to the
# service user (reference: docker-entrypoint.sh behavior).
set -e

DATA_DIR="${OS_DATA_DIR:-/home/openspeech/data}"

if [ "$(id -u)" = "0" ]; then
    mkdir -p "$DATA_DIR"
    chown -R openspeech "$DATA_DIR" || true
    exec su -s /bin/sh openspeech -c "python -m open_speech_tpu.server"
fi

exec python -m open_speech_tpu.server
