from video_gcp_tpu.ops.tree_index import (
    balanced_timesteps,
    bf2df_perm,
    depthfirst2breadthfirst,
    depthfirst2layers,
    df2bf_perm,
    ind_bf2df,
    ind_df2bf,
    interleave,
)
from video_gcp_tpu.ops.cdist import batch_cdist, cdist
from video_gcp_tpu.ops.soft_dtw import soft_dtw
from video_gcp_tpu.ops.dtw import batched_dtw_alignment, min_cumsum
