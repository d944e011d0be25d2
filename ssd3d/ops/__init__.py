from ssd3d.ops.sampling import (
    farthest_point_sample,
    farthest_point_sample_features,
    farthest_point_sample_from_dist,
    gather_points,
    gather_by_mask,
)
from ssd3d.ops.grouping import (
    ball_query,
    ball_query_dilated,
    ball_query_attention,
    ball_query_withidx,
    group_points,
    knn_points,
    query_boxes_3d_mask,
    query_boxes_3d_points,
    query_points_iou,
)
from ssd3d.ops.interpolate import three_nn, three_interpolate, k_interpolate
from ssd3d.ops.nms import nms_bev, batched_class_nms, soft_nms_bev, iou_guided_nms, class_unaware_nms, points_mask_nms

__all__ = [
    "farthest_point_sample",
    "farthest_point_sample_features",
    "farthest_point_sample_from_dist",
    "gather_points",
    "gather_by_mask",
    "ball_query",
    "ball_query_dilated",
    "ball_query_attention",
    "ball_query_withidx",
    "group_points",
    "knn_points",
    "query_boxes_3d_mask",
    "query_boxes_3d_points",
    "query_points_iou",
    "three_nn",
    "three_interpolate",
    "k_interpolate",
    "nms_bev",
    "batched_class_nms",
    "soft_nms_bev",
    "iou_guided_nms",
    "class_unaware_nms",
    "points_mask_nms",
]
