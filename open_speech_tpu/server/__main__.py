"""``python -m open_speech_tpu.server`` — start the speech server."""

from open_speech_tpu.server.app import main

main()
