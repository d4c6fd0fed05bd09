from .api import make_rays, traverse, occluded  # noqa: F401
