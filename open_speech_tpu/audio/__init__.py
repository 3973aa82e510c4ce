"""Host-side audio services: ingest, preprocessing, postprocessing, effects, encode."""
