"""Aux subsystems: profiling/metrics, work queue resume, multihost glue."""

import json
import os

import numpy as np
import pytest

from volrend_tpu.parallel.work_queue import RenderQueue
from volrend_tpu.utils.profiling import FrameTimer, Metrics, fps_counter


def test_frame_timer():
    import jax.numpy as jnp
    t = FrameTimer(100, 100)
    t.start()
    x = jnp.ones((8,))
    for _ in range(3):
        t.frame()
    t.stop(x)
    assert t.n_frames == 3
    assert t.elapsed > 0
    assert t.mrays_per_s > 0
    assert "ms per frame" in t.report()


def test_metrics(tmp_path):
    m = Metrics()
    m.log(0, loss=1.0, psnr=20.0)
    m.log(1, loss=0.5, psnr=25.0)
    p = str(tmp_path / "m.json")
    m.dump(p)
    hist = json.load(open(p))
    assert hist[1]["loss"] == 0.5


def test_fps_counter():
    c = fps_counter(window=5)
    for _ in range(10):
        c.tick()
    assert c.tick() > 0


def test_render_queue_resume(tmp_path):
    out = str(tmp_path / "q")
    done_log = []

    q = RenderQueue(out, n_items=10, process_index=0, process_count=2)
    assert q.my_items() == [0, 2, 4, 6, 8]

    # simulate a crash after the first batch
    todo = q.pending()
    q.run(lambda b: done_log.extend(b), batch_size=2)
    assert len(done_log) == 5

    # "restart": new queue resumes with nothing pending
    q2 = RenderQueue(out, n_items=10, process_index=0, process_count=2)
    assert q2.pending() == []

    # second process has its own shard and manifest
    q3 = RenderQueue(out, n_items=10, process_index=1, process_count=2)
    assert q3.pending() == [1, 3, 5, 7, 9]


def test_render_queue_partial_resume(tmp_path):
    out = str(tmp_path / "q2")
    q = RenderQueue(out, n_items=8)

    class Boom(Exception):
        pass

    calls = []

    def render(batch):
        calls.append(list(batch))
        if len(calls) == 2:
            raise Boom()

    try:
        q.run(render, batch_size=2)
    except Boom:
        pass
    q2 = RenderQueue(out, n_items=8)
    assert q2.pending() == [2, 3, 4, 5, 6, 7]  # batch 1 persisted, 2 not


def test_multihost_single_process():
    from volrend_tpu.parallel import multihost
    multihost.init()
    assert multihost.process_count() == 1
    assert multihost.pose_shard(5) == [0, 1, 2, 3, 4]
    mesh = multihost.global_mesh()
    assert mesh.shape["rays"] >= 1


def test_render_queue_pipelined_overlap(tmp_path):
    """Two-phase run (PP overlap): batch k+1's render_batch must be
    DISPATCHED before batch k's finish runs, and items are marked done
    only after their finish (resume safety)."""
    out = str(tmp_path / "q3")
    q = RenderQueue(out, n_items=6)
    events = []

    def render(batch):
        events.append(("dispatch", tuple(batch)))
        return {"ids": tuple(batch)}

    def finish(batch, result):
        assert result["ids"] == tuple(batch)
        events.append(("finish", tuple(batch)))

    n = q.run(render, batch_size=2, finish=finish)
    assert n == 6
    assert q.pending() == []
    # pipeline order: dispatch(0,1) dispatch(2,3) finish(0,1)
    #                 dispatch(4,5) finish(2,3) finish(4,5)
    assert events == [
        ("dispatch", (0, 1)), ("dispatch", (2, 3)), ("finish", (0, 1)),
        ("dispatch", (4, 5)), ("finish", (2, 3)), ("finish", (4, 5)),
    ]


def test_render_queue_pipelined_resume_mid_finish(tmp_path):
    """A crash between a batch's dispatch and its finish must leave that
    batch pending on restart (done is only persisted after finish)."""
    out = str(tmp_path / "q4")
    q = RenderQueue(out, n_items=4)

    class Boom(Exception):
        pass

    def render(batch):
        return tuple(batch)

    fins = []

    def finish(batch, result):
        if batch == [2, 3]:
            raise Boom()
        fins.append(tuple(batch))

    with pytest.raises(Boom):
        q.run(render, batch_size=2, finish=finish)
    assert fins == [(0, 1)]
    q2 = RenderQueue(out, n_items=4)
    assert q2.pending() == [2, 3]
