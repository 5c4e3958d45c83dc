from video_gcp_tpu.core.attrdict import (
    AttrDict,
    batch_apply,
    listdict2dictlist,
    map_dict,
    rmap,
    subdict,
)
from video_gcp_tpu.core.params import ParamDict
