from daft_exprt_tpu.frontend.audio import load_wav, save_wav, rescale_wav_to_float32
from daft_exprt_tpu.frontend.duration import duration_to_integer, get_min_phone_duration
