from hific_tpu.entropy.ans import (
    RANS_L,
    empty_message,
    flatten_message,
    rans_pop,
    rans_push,
    unflatten_message,
    unflatten_message_scalar,
)
