import numpy as np

from sparktext.fieldnorm import (
    FIELDNORM_TABLE,
    fieldnorm_to_id,
    id_to_fieldnorm,
    quantize,
)


def test_table_shape_and_monotone():
    assert FIELDNORM_TABLE.shape == (256,)
    assert (np.diff(FIELDNORM_TABLE) > 0).all()


def test_exact_small_values():
    for v in range(41):
        assert quantize([v])[0] == v
        assert id_to_fieldnorm(fieldnorm_to_id([v]))[0] == v


def test_decode_encode_idempotent_and_lower_bound():
    lens = np.concatenate([np.arange(0, 5000), np.array([10**6, 10**9])])
    q = quantize(lens)
    assert (q <= lens).all()
    # idempotent: quantize of a quantized value is itself
    assert (quantize(q) == q).all()


def test_encode_monotone():
    lens = np.arange(0, 100000)
    ids = fieldnorm_to_id(lens)
    assert (np.diff(ids.astype(int)) >= 0).all()


def test_clamp_beyond_table():
    huge = int(FIELDNORM_TABLE[-1]) + 10
    assert fieldnorm_to_id([huge])[0] == 255
