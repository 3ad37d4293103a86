from r3d_tpu.ops.effective_rank import effective_rank, effective_rank_loss
