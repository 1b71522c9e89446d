"""Asynchronous pipeline runner over native channels.

The reference runs six processes with internal worker threads and mutexes
(reference: estimator_node.cpp:20-36 m_buf/m_state/l_buf mutexes + process/
process_lidar threads).  Here each stage is one Python thread draining a
bounded native channel and pushing to the next — ctypes blocking pops
release the GIL, so host preprocessing, device dispatch, and IO genuinely
overlap.  A `deterministic` mode drains stages round-robin on one thread
for reproducible tests.
"""

from __future__ import annotations

import threading
import time as _time
import traceback
from dataclasses import dataclass, field
from typing import Callable, Optional

from mvil_fusion_tpu.pipeline.channels import Channel, Closed, Policy


class MultiOut(list):
    """A stage may return MultiOut([...]) to emit several downstream items
    from one input (e.g. draining a buffer)."""


@dataclass
class Stage:
    name: str
    fn: Callable                  # item -> result | None (None = filtered)
    inbox: Channel
    outbox: Optional[Channel] = None
    thread: Optional[threading.Thread] = None
    processed: int = 0
    busy: bool = False            # an item is in flight inside fn
    busy_s: float = 0.0           # cumulative wall seconds inside fn
    errors: list = field(default_factory=list)


class Pipeline:
    def __init__(self, deterministic: bool = False):
        self.stages: list[Stage] = []
        self.deterministic = deterministic
        self._running = False

    def add_stage(self, name: str, fn, capacity: int = 16,
                  policy: Policy = Policy.BLOCK) -> Channel:
        """Append a stage; returns its inbox channel (feed it upstream).
        The stage's output flows into the next stage's inbox."""
        inbox = Channel(capacity=capacity, policy=policy)
        st = Stage(name=name, fn=fn, inbox=inbox)
        if self.stages:
            self.stages[-1].outbox = inbox
        self.stages.append(st)
        return inbox

    # ------------------------------------------------------------ threaded

    def _worker(self, st: Stage):
        while True:
            try:
                item = st.inbox.get()
            except Closed:
                if st.outbox is not None:
                    st.outbox.close()
                return
            st.busy = True
            t0 = _time.perf_counter()
            try:
                res = st.fn(item)
                st.processed += 1
                if res is not None and st.outbox is not None:
                    for r in (res if isinstance(res, MultiOut) else [res]):
                        st.outbox.put(r)
            except Exception:  # stage errors must not kill the pipeline
                st.errors.append(traceback.format_exc())
            finally:
                st.busy_s += _time.perf_counter() - t0
                st.busy = False

    def start(self):
        assert not self.deterministic
        self._running = True
        for st in self.stages:
            st.thread = threading.Thread(target=self._worker, args=(st,),
                                         daemon=True, name=st.name)
            st.thread.start()

    def stop(self, timeout: float = 30.0):
        if self.stages:
            self.stages[0].inbox.close()
        for st in self.stages:
            if st.thread is not None:
                st.thread.join(timeout)
        self._running = False

    def quiesce(self, timeout: float = 120.0, settle: float = 0.05):
        """Block until every channel is empty and stage progress has
        stalled for `settle` seconds (threaded mode; used to separate a
        warmup segment from a timed segment without tearing threads down).
        Returns True if quiescent, False on timeout."""
        import time
        deadline = time.monotonic() + timeout
        last = None
        while time.monotonic() < deadline:
            counts = tuple(st.processed for st in self.stages)
            empty = all(len(st.inbox) == 0 for st in self.stages)
            idle = not any(st.busy for st in self.stages)
            if empty and idle and counts == last:
                return True
            last = counts
            time.sleep(settle)
        return False

    # -------------------------------------------------------- deterministic

    def drain(self):
        """Deterministic single-thread drain: run every queued item through
        the remaining stages in order."""
        for i, st in enumerate(self.stages):
            while len(st.inbox) > 0:
                try:
                    item = st.inbox.get(timeout=0.0)
                except (Closed, TimeoutError):
                    break
                try:
                    res = st.fn(item)
                    st.processed += 1
                    if res is not None and st.outbox is not None:
                        for r in (res if isinstance(res, MultiOut)
                                  else [res]):
                            st.outbox.put(r)
                except Exception:
                    st.errors.append(traceback.format_exc())

    def feed(self, item):
        self.stages[0].inbox.put(item)
        if self.deterministic:
            self.drain()
