from . import vfe, backbone3d, backbone2d, head, detector
