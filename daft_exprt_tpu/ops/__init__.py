from daft_exprt_tpu.ops.mel import (
    mel_filterbank, MelExtractor, frame_energy,
)
from daft_exprt_tpu.ops.grl import gradient_reversal
