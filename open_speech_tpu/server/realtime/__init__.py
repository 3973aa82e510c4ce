"""OpenAI Realtime API compatibility layer (reference: src/realtime/)."""
