from .rays import get_rays, rand_poses, nerf_matrix_to_ngp

__all__ = ["get_rays", "rand_poses", "nerf_matrix_to_ngp"]
