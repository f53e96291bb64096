"""Application layer: pipelines, CLIs, effects/mixdown, TTS, model manager, UI."""
