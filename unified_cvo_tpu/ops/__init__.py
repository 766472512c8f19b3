from unified_cvo_tpu.ops import lie, poly
