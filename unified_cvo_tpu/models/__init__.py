from unified_cvo_tpu.models.align import (
    align,
    function_angle,
    inner_product,
    compute_association,
)
