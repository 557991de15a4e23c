from daft_exprt_tpu.models.daft_exprt import DaftExprt, sequence_mask
from daft_exprt_tpu.models.pitch_predictor import PitchPredictor
