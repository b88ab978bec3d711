from . import voxelize, scatter, windows, attention, bev, postprocess, nms
