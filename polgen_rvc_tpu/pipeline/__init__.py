from .config import ConversionOptions, EngineConfig
from .engine import VoiceConverter
