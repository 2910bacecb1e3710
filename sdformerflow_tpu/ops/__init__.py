from . import surrogate, neurons, windows, voxel, normalization, interpolate, pad
