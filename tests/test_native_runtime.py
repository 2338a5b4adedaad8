"""Native C++ runtime: build, queue semantics, shard loader correctness."""

import os
import threading

import numpy as np
import pytest

from quantized_spectrum_cartography_tpu.runtime import (
    NativeBatchQueue,
    NativeShardLoader,
    build_runtime,
    native_available,
    write_shard,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++ toolchain unavailable")


def test_build_produces_so():
    so = build_runtime()
    assert os.path.exists(so)


def test_queue_roundtrip_and_batching():
    item = np.arange(12, dtype=np.float32)
    q = NativeBatchQueue(capacity=64, item_bytes=item.nbytes)
    for i in range(10):
        assert q.push(item + i)
    out = q.pop_batch(max_items=4)
    assert out.shape[0] == 4
    got = np.frombuffer(out[0].tobytes(), np.float32)
    np.testing.assert_allclose(got, item)
    got3 = np.frombuffer(out[3].tobytes(), np.float32)
    np.testing.assert_allclose(got3, item + 3)
    assert q.pushed == 10
    assert q.popped == 4
    q.close()


def test_queue_timeout_on_empty():
    q = NativeBatchQueue(capacity=4, item_bytes=8)
    out = q.pop_batch(max_items=2, timeout_ms=50)
    assert out.shape[0] == 0
    q.close()


def test_queue_concurrent_producers():
    item_bytes = 16
    q = NativeBatchQueue(capacity=1024, item_bytes=item_bytes)

    def produce(tid):
        x = np.full(4, tid, np.float32)
        for _ in range(50):
            q.push(x)

    threads = [threading.Thread(target=produce, args=(t,)) for t in range(4)]
    for t in threads:
        t.start()
    got = 0
    while got < 200:
        got += q.pop_batch(max_items=32, timeout_ms=2000).shape[0]
    for t in threads:
        t.join()
    assert got == 200


def test_shard_loader_samples_real_items(tmp_path):
    N, I, J = 32, 7, 5
    maps = np.random.default_rng(0).normal(size=(N, I, J)).astype(np.float32)
    path = os.path.join(str(tmp_path), "shard.f32")
    write_shard(path, maps)
    loader = NativeShardLoader(path, (I, J), batch=8, num_threads=2, seed=1)
    assert len(loader) == N
    flat = maps.reshape(N, -1)
    for _ in range(5):
        batch = loader.next_batch(timeout_ms=5000)
        assert batch.shape == (8, I, J)
        for row in batch.reshape(8, -1):
            # every sampled row must be an actual dataset item
            assert np.any(np.all(np.isclose(flat, row[None]), axis=1))
    assert loader.batches_served == 5
    loader.close()


def test_shard_loader_rejects_bad_size(tmp_path):
    path = os.path.join(str(tmp_path), "bad.f32")
    np.ones(7, np.float32).tofile(path)
    with pytest.raises(OSError):
        NativeShardLoader(path, (2, 2), batch=2)
