from daft_exprt_tpu.data.dataset import (
    DaftExprtDataset, collate_batch, BatchIterator, PrefetchIterator,
    prepare_data_iterators,
)
from daft_exprt_tpu.data.dynamic_stats import DynamicSpeakerStatsManager
from daft_exprt_tpu.data.sets import create_sets, extract_features_stats
