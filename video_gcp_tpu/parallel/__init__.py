from video_gcp_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from video_gcp_tpu.parallel.train_step import TrainState, make_train_step
