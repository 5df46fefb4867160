from .attention import multi_head_attention
from .knn import dense_knn, VoxelOccupancy
from .fps import farthest_point_sampling
