from r3d_tpu.data.preprocess.resnet import ResNet50Features, make_feature_extractor
from r3d_tpu.data.preprocess.depth import (
    kinect_xml_to_depth,
    normalize_depth_minmax,
    preprocess_depth_sequence,
)
