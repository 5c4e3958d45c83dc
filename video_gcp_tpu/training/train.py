"""CLI entry: python -m video_gcp_tpu.training.train --path <conf_dir>
(reference: python gcp/prediction/train.py --path=<conf_dir>)."""
from video_gcp_tpu.core.platform import apply_platform_env

apply_platform_env()

from video_gcp_tpu.training.trainer import main  # noqa: E402

if __name__ == "__main__":
    main()
