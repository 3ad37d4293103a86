from r3d_tpu.data.mapping import read_mapping_dict
from r3d_tpu.data.protocol import (
    labels_to_indices,
    labels_to_transcript,
    make_example,
    pad_transcript,
    Example,
)
from r3d_tpu.data.pipeline import pad_batch, bucket_length, BucketedLoader
