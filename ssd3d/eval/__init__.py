from ssd3d.eval.kitti_ap import evaluate_kitti_ap, EvalObject

__all__ = ["evaluate_kitti_ap", "EvalObject"]
