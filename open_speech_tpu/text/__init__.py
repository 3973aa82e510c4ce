"""Text-domain services: transcript formatters, pronunciation dict, SSML."""
