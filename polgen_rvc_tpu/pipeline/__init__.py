from .config import ConversionOptions, EngineConfig
from .engine import VoiceConverter
from .factory import build_converter, build_synthetic_converter
