from video_gcp_tpu.training.config import load_config, get_dataset_path
from video_gcp_tpu.training.trainer import ModelTrainer
