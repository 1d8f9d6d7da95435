"""Background topology-event worker (opt-in via train.py --async_topology).

The reference blocks training for every densify/merge event
(train.py:171-200 runs torch optimizer surgery inline); on this stack an
event at 500k segments costs ~10 s of host time — device->host pull over a
~1 MB/s link plus single-core numpy graph surgery — which caps sustained
Stage-III throughput well below the pure step rate (perf ledger, CLAUDE.md).

This worker moves everything except the final install off the critical path:

1. `launch` (main thread, milliseconds): snapshot the arenas as device-side
   slices. The slices are NEW buffers, so train steps dispatched afterwards
   can donate the live arenas without invalidating the snapshot.
2. worker thread: transfer the snapshot (the ~3 s pull now overlaps
   training), then run the full strategy/merge/walk pipeline on it
   (graph_ops.compute_topology_update).
3. `poll` (main thread, between steps): when the thread finishes, install the
   update. Surviving rows gather their LIVE device values and Adam moments
   (models/hair.py install carry_param_values) — only topology and new-row
   values come from the snapshot.

Documented semantics deviation from the reference (hence opt-in): strategies
see stats/values as of the snapshot iteration, the surgery lands ~the flight
length (a few seconds of steps) late, and new rows are synthesized from
snapshot-time parent values. Events that host-mutate surviving rows (opacity
reset, growth) stay synchronous in the driver and force-settle any flight
first.
"""

import threading
import time


class TopologyWorker:
    """One in-flight topology event at a time, computed on a daemon thread."""

    def __init__(self, model):
        self.model = model
        self._thread = None
        self._result = None
        self._error = None

    @property
    def in_flight(self) -> bool:
        return self._thread is not None

    def launch(self, *, densify: bool, merge: bool, extent: float, size_th):
        """Snapshot the model and start computing an event. Any previous
        flight is settled (blocking) first — with the reference cadences
        (events every 100 iterations, flights of a few seconds) a pending
        flight here means the schedule is misconfigured, not a fast path."""
        from hairgs_tpu.core.hostsync import sliced_cut

        self.poll(force=True)
        m = self.model
        e, s = m.num_endpoints, m.num_segments
        p = m.params
        cut = sliced_cut({
            "endpoints": (p.endpoints, e),
            "endpoint_pairs": (m.graph.endpoint_pairs, s),
            "features_dc": (p.features_dc, s),
            "features_rest": (p.features_rest, s),
            "opacity": (p.opacity, s),
            "mask": (p.mask, s),
            "width": (p.width, s),
            "stats/max_radii2d": (m.stats.max_radii2d, s),
            "stats/xyz_grad_accum": (m.stats.xyz_grad_accum, s),
            "stats/denom": (m.stats.denom, s),
        })
        # merge thresholds follow an LR-style schedule on the live model;
        # freeze them at launch so the flight is deterministic
        kwargs = dict(densify=densify, merge=merge, extent=extent,
                      max_screen_size=size_th,
                      merge_dist_th=m.merge_dist_th,
                      merge_angle_th=m.merge_angle_th)
        self._thread = threading.Thread(
            target=self._run, args=(cut, kwargs), daemon=True,
            name="topology-worker")
        self._thread.start()

    def _run(self, cut, kwargs):
        try:
            from hairgs_tpu.core.hostsync import finish_pull
            from hairgs_tpu.topo.graph_ops import compute_topology_update

            t0 = time.perf_counter()
            pulled = finish_pull(cut)
            t_pull = time.perf_counter()
            stats = {k[len("stats/"):]: pulled.pop(k)
                     for k in list(pulled) if k.startswith("stats/")}
            upd = compute_topology_update(
                self.model, arrays=pulled, stats=stats, **kwargs)
            upd.info.update(
                t_async_pull=round(t_pull - t0, 3),
                t_async_compute=round(time.perf_counter() - t_pull, 3),
            )
            self._result = upd
        except BaseException as e:  # re-raised on the main thread in poll()
            self._error = e

    def poll(self, force: bool = False, training_info=None) -> bool:
        """Apply the pending update if the flight finished (or `force` a
        blocking join). Returns True when a topology change was installed."""
        if self._thread is None:
            return False
        if not force and self._thread.is_alive():
            return False
        self._thread.join()
        self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("async topology event failed") from err
        upd, self._result = self._result, None
        from hairgs_tpu.topo.graph_ops import apply_topology_update

        apply_topology_update(self.model, upd, training_info)
        return True
