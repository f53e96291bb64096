from .audio_io import load_audio, read_audio, write_audio, to_stereo, save_stereo_wav
from .progress import ProgressReporter
