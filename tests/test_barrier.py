"""Barrier execution mode — the gang-scheduling surface a distributed
training launch (DDP/Horovod-style) runs on: all tasks of a barrier
stage start together, and BarrierTaskContext.allGather exchanges
worker metadata (addresses/ports) before training begins. This is the
engine-side contract a 1000-executor training job relies on; the
barrier() escape hatch is the documented exception to "DataFrame, not
RDD" (SURVEY §7.3) because gang semantics are not expressible as a
declarative plan.
"""

from __future__ import annotations


def test_barrier_stage_allgather_sees_every_task(spark):
    rdd = spark.sparkContext.parallelize(range(16), 4)

    def exchange(it):
        from pyspark import BarrierTaskContext

        ctx = BarrierTaskContext.get()
        # every task contributes its partition id; allGather returns
        # all contributions to all tasks, in task order
        gathered = ctx.allGather(str(ctx.partitionId()))
        yield (ctx.partitionId(), sorted(int(g) for g in gathered), sum(it))

    out = rdd.barrier().mapPartitions(exchange).collect()
    assert len(out) == 4
    for pid, seen, _ in out:
        assert seen == [0, 1, 2, 3]  # every task saw every other task
    assert sum(s for _, _, s in out) == sum(range(16))  # data intact


def test_barrier_tasks_synchronize_at_barrier_call(spark):
    """ctx.barrier() is a rendezvous: no task proceeds past it until
    all have arrived. Observable as: timestamps after the barrier are
    all >= every task's timestamp before it."""
    import time

    rdd = spark.sparkContext.parallelize(range(4), 4)

    def run(it):
        from pyspark import BarrierTaskContext

        ctx = BarrierTaskContext.get()
        pid = ctx.partitionId()
        time.sleep(0.1 * pid)  # stagger arrivals
        before = time.time()
        ctx.barrier()
        after = time.time()
        yield (pid, before, after)

    rows = rdd.barrier().mapPartitions(run).collect()
    latest_before = max(b for _, b, _ in rows)
    for _, _, after in rows:
        assert after >= latest_before - 0.05  # rendezvous held
