from kintinuous_tpu.eval.ate import absolute_trajectory_error, align_umeyama

__all__ = ["absolute_trajectory_error", "align_umeyama"]
