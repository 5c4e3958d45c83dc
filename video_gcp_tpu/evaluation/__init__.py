from video_gcp_tpu.evaluation.evaluator import Evaluator
