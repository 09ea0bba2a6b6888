"""The digest-keyed device operand cache (utils/devcache)."""

import numpy as np

from genomics_rs_tpu.utils import devcache


def setup_function(_fn):
    devcache.clear()


def test_same_content_returns_same_device_array():
    a = np.arange(256, dtype=np.uint8).reshape(2, 128)
    d1 = devcache.device_put_cached(a)
    d2 = devcache.device_put_cached(a.copy())  # equal content, new obj
    assert d1 is d2
    np.testing.assert_array_equal(np.asarray(d1), a)


def test_different_content_and_shape_miss():
    a = np.zeros((2, 128), np.uint8)
    b = np.zeros((2, 128), np.uint8)
    b[0, 0] = 1
    c = np.zeros((256,), np.uint8)  # same bytes as a, new shape
    da, db, dc = (devcache.device_put_cached(x) for x in (a, b, c))
    assert da is not db and da is not dc
    np.testing.assert_array_equal(np.asarray(db), b)


def test_eviction_is_bounded_lru(monkeypatch):
    monkeypatch.setattr(devcache, "CAP_BYTES", 3000)
    arrs = [np.full(1000, i, np.uint8) for i in range(5)]
    devs = [devcache.device_put_cached(a) for a in arrs]
    # Only the most recent entries stay resident.
    assert devcache._bytes <= 3000 + 1000
    again = devcache.device_put_cached(arrs[-1])
    assert again is devs[-1]
    # The oldest was evicted: a fresh put returns a new device array.
    fresh = devcache.device_put_cached(arrs[0])
    assert fresh is not devs[0]


def test_noncontiguous_input_is_handled():
    a = np.arange(512, dtype=np.uint8).reshape(4, 128)[:, ::2]
    d = devcache.device_put_cached(a)
    np.testing.assert_array_equal(np.asarray(d), a)
