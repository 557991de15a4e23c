from daft_exprt_tpu.utils.multiproc import launch_multi_process, get_nb_jobs
from daft_exprt_tpu.utils.misc import chunker, estimate_required_time
from daft_exprt_tpu.utils.plots import plot_2d_data
