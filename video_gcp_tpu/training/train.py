"""CLI entry: python -m video_gcp_tpu.training.train --path <conf_dir>
(reference: python gcp/prediction/train.py --path=<conf_dir>)."""
from video_gcp_tpu.training.trainer import main

if __name__ == "__main__":
    main()
