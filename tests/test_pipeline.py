import threading
import time

import numpy as np
import pytest

from mvil_fusion_tpu.pipeline.channels import Channel, Closed, Policy
from mvil_fusion_tpu.pipeline.runner import Pipeline


def test_channel_fifo_and_payloads():
    ch = Channel(capacity=8)
    arrays = [np.arange(k, k + 5) for k in range(5)]
    for a in arrays:
        ch.put(a)
    assert len(ch) == 5
    for a in arrays:
        np.testing.assert_array_equal(ch.get(), a)


def test_channel_block_backpressure():
    ch = Channel(capacity=2, policy=Policy.BLOCK)
    ch.put(1)
    ch.put(2)
    done = []

    def producer():
        ch.put(3)   # blocks until a slot frees
        done.append(True)

    t = threading.Thread(target=producer)
    t.start()
    time.sleep(0.1)
    assert not done
    assert ch.get() == 1
    t.join(2.0)
    assert done
    assert ch.get() == 2 and ch.get() == 3


def test_channel_drop_oldest():
    ch = Channel(capacity=3, policy=Policy.DROP_OLDEST)
    for k in range(10):
        ch.put(k)
    assert len(ch) == 3
    assert ch.dropped == 7
    assert ch.get() == 7   # oldest surviving


def test_channel_close_and_timeout():
    ch = Channel(capacity=2)
    with pytest.raises(TimeoutError):
        ch.get(timeout=0.05)
    ch.put("x")
    ch.close()
    assert ch.get() == "x"      # drains after close
    with pytest.raises(Closed):
        ch.get()
    with pytest.raises(Closed):
        ch.put("y")


def test_pipeline_threaded():
    p = Pipeline()
    inbox = p.add_stage("double", lambda x: x * 2)
    p.add_stage("plus1", lambda x: x + 1)
    results = []
    p.add_stage("sink", lambda x: results.append(x))
    p.start()
    for k in range(50):
        inbox.put(k)
    p.stop()
    assert sorted(results) == [2 * k + 1 for k in range(50)]
    assert all(not st.errors for st in p.stages)


def test_pipeline_deterministic_and_errors():
    p = Pipeline(deterministic=True)
    def flaky(x):
        if x == 3:
            raise RuntimeError("boom")
        return x
    inbox = p.add_stage("flaky", flaky)
    out = []
    p.add_stage("sink", lambda x: out.append(x))
    for k in range(6):
        p.feed(k)
    assert out == [0, 1, 2, 4, 5]
    assert len(p.stages[0].errors) == 1


def test_pipeline_multiout_and_quiesce():
    """A stage can emit several downstream items from one input (MultiOut —
    the sweep-buffer drain), and quiesce() waits for full drain including
    in-flight work."""
    import time
    from mvil_fusion_tpu.pipeline.runner import MultiOut

    p = Pipeline()

    def burst(x):
        time.sleep(0.05)                 # in-flight work quiesce must see
        return MultiOut([x, x + 100]) if x % 2 == 0 else x

    inbox = p.add_stage("burst", burst)
    out = []
    p.add_stage("sink", lambda x: out.append(x))
    p.start()
    for k in range(6):
        inbox.put(k)
    assert p.quiesce(timeout=10.0)
    assert sorted(out) == [0, 1, 2, 3, 4, 5, 100, 102, 104]
    # pipeline still alive after quiesce: feed more
    inbox.put(7)
    assert p.quiesce(timeout=10.0)
    assert 7 in out
    p.stop()
    assert all(not st.errors for st in p.stages)
