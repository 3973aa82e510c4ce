"""Audio + kernel substrate: codecs, resampling, mel front-end, attention, DSP."""
