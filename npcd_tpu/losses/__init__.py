from .pointnerf_loss import (
    PointNeRFLossWeights,
    image_reconstruction_loss,
    neural_point_cloud_kl_loss,
    neural_point_cloud_tv_loss,
    pointnerf_loss,
)
