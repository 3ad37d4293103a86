from r3d_tpu.eval.decode import decode_anticipation
from r3d_tpu.eval.moc import eval_file_counts, moc_from_counts, MoCAccumulator
