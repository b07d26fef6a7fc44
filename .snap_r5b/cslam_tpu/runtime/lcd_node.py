"""Loop-closure detection front end (per-robot node).

Behavior parity with the reference's detection orchestrator
(``cslam/global_descriptor_loop_closure_detection.py`` +
``loop_closure_detection_node.py``): keyframe intake -> global descriptor ->
intra/inter matching; periodic gossip of descriptor and match buffers with
windowed resend, receiver-side dedup and garbage collection; budgeted
inter-robot detection rounds (MAC selection + vertex-cover brokerage);
geometric-verification outcome intake. Byte-accurate communication
accounting uses the reference's constants (descriptor float = 4 B,
match = 20 B; ``gdlcd.py:217-220,281-282``).
"""
from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from cslam_tpu.matching.sparse_matching import LoopClosureSparseMatching
from cslam_tpu.models import make_global_descriptor
from cslam_tpu.selection.broker import Broker
from cslam_tpu.utils import profiling
from cslam_tpu.runtime.neighbors import NeighborManager
from cslam_tpu.types import (EdgeInterRobot, GlobalDescriptor,
                             GlobalDescriptors, InterRobotLoopClosure,
                             InterRobotMatch, InterRobotMatches, KeyValue,
                             LocalDescriptorsRequest, LocalKeyframeMatch)

DESCRIPTOR_FLOAT_BYTES = 4
MATCH_BYTES = 20


def _chunks_from(buffer: Dict[int, Any], start_key: int,
                 chunk_size: int) -> List[List[Any]]:
    """Split buffered values with key >= start_key into bounded chunks
    (reference ``utils/misc.py:21-33`` semantics)."""
    out: List[List[Any]] = []
    current: List[Any] = []
    for k in sorted(buffer.keys()):
        if k < start_key:
            continue
        current.append(buffer[k])
        if len(current) == chunk_size:
            out.append(current)
            current = []
    if current:
        out.append(current)
    return out


class DetectionFrontEnd:
    """Global-descriptor loop-closure detection for one robot."""

    def __init__(self, ctx, model=None):
        self.ctx = ctx
        self.params = ctx.params
        self.robot_id = self.params["robot_id"]
        self.lcm = LoopClosureSparseMatching(self.params)
        self.model = (model if model is not None
                      else make_global_descriptor(self.params))
        self.keyframe_type = ("pointcloud" if self.params.get(
            "frontend.sensor_type") == "lidar" else "rgb")

        self.neighbor_manager = NeighborManager(ctx, self.params)

        gd_topic = "/cslam/" + self.params.get(
            "frontend.global_descriptors_topic", "global_descriptors").lstrip("/")
        match_topic = "/cslam/" + self.params.get(
            "frontend.inter_robot_matches_topic", "inter_robot_matches").lstrip("/")
        self.global_descriptor_publisher = ctx.create_publisher(gd_topic)
        ctx.create_subscription(gd_topic, self.global_descriptor_callback)
        self.inter_robot_matches_publisher = ctx.create_publisher(match_topic)
        ctx.create_subscription(match_topic, self.inter_robot_matches_callback)

        # keyframe intake is best-effort-bounded like the reference's
        # sensor-plane QoS (rgbd_handler.cpp:58-61): under a keyframe flood
        # only the freshest `depth` frames are embedded, the backlog never
        # grows, and the detection/PGO planes stay live
        from cslam_tpu.runtime.bus import QoSProfile
        ctx.create_subscription(
            "cslam/keyframe_data", self.receive_keyframe,
            qos=QoSProfile(
                best_effort=bool(self.params.get(
                    "frontend.keyframe_intake_best_effort", True)),
                depth=int(self.params.get(
                    "frontend.keyframe_intake_depth", 100))))
        self.local_match_publisher = ctx.create_publisher(
            "cslam/local_keyframe_match")
        ctx.create_subscription("/cslam/inter_robot_loop_closure",
                                self.receive_inter_robot_loop_closure)
        self.local_descriptors_request_publishers = {
            i: ctx.create_publisher(f"/r{i}/cslam/local_descriptors_request")
            for i in range(self.params["max_nb_robots"])}

        period = self.params["frontend.detection_publication_period_sec"]
        ctx.create_timer(period, self.global_descriptors_timer_callback)
        ctx.create_timer(period, self.inter_robot_matches_timer_callback)
        ctx.create_timer(
            self.params["frontend.inter_robot_detection_period_sec"],
            self.detect_inter)
        # gossip-intake micro-batcher: descriptor chunks arriving from
        # several senders in one poll cycle are searched against the local
        # bank as ONE device dispatch at the next flush (each chunk on its
        # own costs a full device round-trip — ~30 ms on the relay-attached
        # chip, the dominant per-step cost in the lidar e2e pipeline)
        self._gossip_intake: List[Any] = []
        self._pending_searches: List[Any] = []  # dispatched bank searches
        self._pending_embeds: List[Any] = []  # dispatched descriptor nets
        self._pending_selection = None  # deferred detect_inter round
        self._last_solve_mutations = None  # ACM pool state at last solve
        ctx.create_timer(
            self.params.get("frontend.gossip_intake_flush_period_sec", 0.1),
            self._flush_gossip_intake)

        self.global_descriptors_buffer: Dict[int, GlobalDescriptor] = {}
        self.inter_robot_matches_buffer: Dict[int, EdgeInterRobot] = {}
        self.nb_inter_robot_matches = 0

        self.enable_logs = self.params.get("evaluation.enable_logs", False)
        self.log_publisher = ctx.create_publisher("cslam/log_info")
        self.log_matches_publisher = ctx.create_publisher("cslam/log_matches")
        self.stats = {
            "nb_matches": 0, "nb_failed_matches": 0,
            "nb_vertices_transmitted": 0, "nb_matches_selected": 0,
            "detection_cumulative_communication": 0,
            "sparsification_cumulative_computation_time": 0.0,
        }

    # ------------------------------------------------------------------
    # Keyframe intake (reference gdlcd.py:388-405, 148-174)
    # ------------------------------------------------------------------

    def receive_keyframe(self, msg) -> None:
        data = msg.image if self.keyframe_type == "rgb" else msg.points
        begin = getattr(self.model, "compute_embedding_begin", None)
        if begin is not None and self.params.get("frontend.async_detection",
                                                 True):
            self._drain_embeds(aged_only=True)
            with profiling.span("lcd.embed"):
                emb = begin(data)
            if not isinstance(emb, np.ndarray):
                # device result: the blocking read (~30-50 ms relay RTT
                # per keyframe — 50 s of the round-5 visual e2e steady
                # wall) happens one poll cycle later, when the
                # dispatch-time prefetch has landed
                self._pending_embeds.append(
                    (emb, msg.id, self.ctx.clock.now()))
                return
            with profiling.span("lcd.local_detect"):
                self.add_global_descriptor_to_map(emb, msg.id)
            return
        with profiling.span("lcd.embed"):
            embedding = self.model.compute_embedding(data)
        with profiling.span("lcd.local_detect"):
            self.add_global_descriptor_to_map(np.asarray(embedding), msg.id)

    def _drain_embeds(self, aged_only: bool = False) -> None:
        """Materialize deferred descriptor inferences (stamps are
        monotonic, so the aged prefix is a simple split)."""
        if not self._pending_embeds:
            return
        if aged_only:
            from cslam_tpu.utils import device_read
            now = self.ctx.clock.now()
            max_defer = (self.params.get("frontend.harvest_max_defer_sec",
                                         2.0)
                         if self.params.get("frontend.harvest_ready_gate",
                                            False) else 0.0)
            n = 0
            while (n < len(self._pending_embeds)
                   and self._pending_embeds[n][2] < now):
                n += 1
            if max_defer:
                # stop the aged prefix at the first not-yet-ready result
                # still inside the defer bound (keyframe order must be
                # preserved, so the prefix split stays a prefix split)
                m = 0
                while m < n:
                    dev, _, stamp = self._pending_embeds[m]
                    if (stamp >= now - max_defer
                            and not device_read.ready((dev,))):
                        break
                    m += 1
                n = m
            if n == 0:
                return
            take, self._pending_embeds = (self._pending_embeds[:n],
                                          self._pending_embeds[n:])
        else:
            take, self._pending_embeds = self._pending_embeds, []
        finish = self.model.compute_embedding_finish
        with profiling.span("lcd.embed_harvest"):
            for dev, kf_id, _ in take:
                emb = finish(dev)
                with profiling.span("lcd.local_detect"):
                    self.add_global_descriptor_to_map(emb, kf_id)

    def add_global_descriptor_to_map(self, embedding: np.ndarray,
                                     kf_id: int) -> None:
        """Register a local keyframe descriptor and dispatch its cross-bank
        search. With ``frontend.async_detection`` (default) the search
        result is harvested at the next gossip-intake flush — the device
        round-trips of all robots/planes in a poll cycle overlap instead of
        serializing (this pair of blocking reads was ~130 ms/keyframe of
        the lidar e2e steady state). Match bookkeeping is order-insensitive
        (the ACM candidate buffer dedups edges), so results are identical
        to the synchronous flow, one cycle later."""
        self.detect_intra(embedding, kf_id)
        handle = self.lcm.add_local_global_descriptor_begin(embedding, kf_id)
        self.global_descriptors_buffer[kf_id] = GlobalDescriptor(
            keyframe_id=kf_id, robot_id=self.robot_id, descriptor=embedding)
        self._pending_searches.append((handle, self.ctx.clock.now()))
        if not self.params.get("frontend.async_detection", True):
            self._harvest_searches()

    def detect_intra(self, embedding: np.ndarray, kf_id: int) -> None:
        if not self.params.get("frontend.enable_intra_robot_loop_closures",
                               False):
            return
        kf_match, _ = self.lcm.match_local_loop_closures(embedding, kf_id)
        if kf_match is not None:
            self.local_match_publisher.publish(
                LocalKeyframeMatch(keyframe0_id=kf_id, keyframe1_id=kf_match))

    # ------------------------------------------------------------------
    # Gossip plane (reference gdlcd.py:176-289)
    # ------------------------------------------------------------------

    def global_descriptors_timer_callback(self) -> None:
        if not self.global_descriptors_buffer:
            return
        latest = max(self.global_descriptors_buffer.keys())
        from_kf = self.neighbor_manager.select_from_which_kf_to_send(latest)
        msgs = _chunks_from(
            self.global_descriptors_buffer, from_kf,
            self.params["frontend.detection_publication_max_elems_per_msg"])
        for chunk in msgs:
            self.global_descriptor_publisher.publish(
                GlobalDescriptors(descriptors=chunk))
            self.stats["detection_cumulative_communication"] += (
                len(chunk) * len(chunk[0].descriptor) * DESCRIPTOR_FLOAT_BYTES)
        self._gc_descriptors()
        self._log("detection_cumulative_communication")

    def inter_robot_matches_timer_callback(self) -> None:
        self._flush_gossip_intake()
        # aged handles only (async mode): a handle dispatched THIS cycle
        # still has its device->host copy in flight — blocking on it here
        # pays the full relay RTT the dispatch-time prefetch exists to
        # hide (measured 36 ms/call x 2100 calls = 76 s of the round-5
        # lidar e2e steady wall). Harvesting it next cycle finds the
        # bytes already local (~0.3 ms); matches publish one publication
        # period later, which the gossip protocol absorbs by design.
        self._harvest_searches(aged_only=True)
        if not self.inter_robot_matches_buffer:
            return
        latest = max(self.inter_robot_matches_buffer.keys())
        from_idx = self.neighbor_manager.select_from_which_match_to_send(latest)
        chunks = _chunks_from(
            self.inter_robot_matches_buffer, from_idx,
            self.params["frontend.detection_publication_max_elems_per_msg"])
        # When exactly two robots are in range, both already detected these
        # matches themselves — skip them (reference gdlcd.py:254-263; the
        # reference mutates the list while iterating, we filter cleanly).
        _, in_range = self.neighbor_manager.check_neighbors_in_range()
        if len(in_range) == 2:
            in_range_set = set(in_range)
            chunks = [[m for m in c
                       if not (m.robot0_id in in_range_set
                               and m.robot1_id in in_range_set)]
                      for c in chunks]
            chunks = [c for c in chunks if c]
        for chunk in chunks:
            msg = InterRobotMatches(
                robot_id=self.robot_id,
                matches=[InterRobotMatch.from_edge(e) for e in chunk])
            self.inter_robot_matches_publisher.publish(msg)
            self.stats["detection_cumulative_communication"] += (
                len(msg.matches) * MATCH_BYTES)
        self._gc_matches()
        self._log("detection_cumulative_communication")

    def _gc_descriptors(self) -> None:
        if not self.global_descriptors_buffer:
            return
        keep_from = self.neighbor_manager.useless_descriptors(
            max(self.global_descriptors_buffer.keys()))
        if keep_from >= min(self.global_descriptors_buffer.keys()):
            for k in [k for k in self.global_descriptors_buffer
                      if k < keep_from]:
                del self.global_descriptors_buffer[k]

    def _gc_matches(self) -> None:
        if not self.inter_robot_matches_buffer:
            return
        keep_from = self.neighbor_manager.useless_matches(
            max(self.inter_robot_matches_buffer.keys()))
        if keep_from >= min(self.inter_robot_matches_buffer.keys()):
            for k in [k for k in self.inter_robot_matches_buffer
                      if k < keep_from]:
                del self.inter_robot_matches_buffer[k]

    def global_descriptor_callback(self, msg: GlobalDescriptors) -> None:
        if msg.descriptors[0].robot_id == self.robot_id:
            return
        # dedup happens at arrival (the unknown-range window is per
        # sender-message); the bank add + local search are deferred to the
        # micro-batch flush
        self._gossip_intake.extend(
            msg.descriptors[i] for i in
            self.neighbor_manager.get_unknown_range(msg.descriptors))

    def _flush_gossip_intake(self) -> None:
        self._harvest_selection(force=False)  # only if the solve is done
        self._drain_embeds(aged_only=True)
        self._harvest_searches(aged_only=True)
        if not self._gossip_intake:
            return
        pending, self._gossip_intake = self._gossip_intake, []
        # whole cycle's intake (all senders) searched against the local
        # bank in ONE device dispatch; harvested next flush (async mode)
        with profiling.span("lcd.gossip_search"):
            handle = self.lcm.add_other_robot_global_descriptors_begin(
                pending)
        self._pending_searches.append((handle, self.ctx.clock.now()))
        if not self.params.get("frontend.async_detection", True):
            self._harvest_searches()

    def _harvest_searches(self, aged_only: bool = False) -> None:
        """Materialize pending cross-bank searches (local-keyframe and
        gossip-chunk) in one overlapped read burst and fold the resulting
        matches into the gossip buffer.

        ``aged_only`` harvests only handles dispatched at an EARLIER sim
        time: their dispatch-side ``device_read.prefetch`` copies have had
        a full poll cycle to land, so the reads here are local-memory
        copies instead of relay round-trips. Synchronous mode (and the
        end-of-mission drain) harvests everything.
        """
        if not self._pending_searches:
            return
        from cslam_tpu.utils import device_read
        if aged_only and self.params.get("frontend.async_detection", True):
            now = self.ctx.clock.now()
            # readiness gate (opt-in): an aged handle whose program is
            # still queued behind a big device program (MAC solve, verify
            # batch) on the serialized relay executor would block the
            # detection plane for the full queue delay (~50 ms/read in the
            # round-5 lidar e2e). Defer it until the client-side future
            # resolves, but never past the defer bound (matches must keep
            # flowing at the gossip cadence).
            max_defer = (self.params.get("frontend.harvest_max_defer_sec",
                                         2.0)
                         if self.params.get("frontend.harvest_ready_gate",
                                            False) else 0.0)
            take, keep = [], []
            for ht in self._pending_searches:
                if ht[1] >= now:
                    keep.append(ht)
                elif (max_defer and ht[1] >= now - max_defer
                        and not device_read.ready(ht[0].arrays)):
                    keep.append(ht)
                else:
                    take.append(ht)
            if not take:
                return
            pending, self._pending_searches = take, keep
        else:
            pending, self._pending_searches = self._pending_searches, []
        device_read.prefetch(a for h, _ in pending for a in h.arrays)
        with profiling.span("lcd.search_harvest"):
            for h, _ in pending:
                if h.keyframe_id is not None:
                    matches = self.lcm.add_local_global_descriptor_finish(h)
                else:
                    matches = \
                        self.lcm.add_other_robot_global_descriptors_finish(h)
                for match in matches:
                    self.inter_robot_matches_buffer[
                        self.nb_inter_robot_matches] = match
                    self.nb_inter_robot_matches += 1

    def inter_robot_matches_callback(self, msg: InterRobotMatches) -> None:
        if msg.robot_id == self.robot_id:
            return
        for match in msg.matches:
            self.lcm.candidate_selector.add_match(match.to_edge())

    # ------------------------------------------------------------------
    # Inter-robot detection round (reference gdlcd.py:309-386)
    # ------------------------------------------------------------------

    def detect_inter(self) -> None:
        self._flush_gossip_intake()  # candidates current up to last cycle
        self._harvest_searches(aged_only=True)
        self._harvest_selection()  # previous round applied before new offsets
        in_range, in_range_list = \
            self.neighbor_manager.check_neighbors_in_range()
        if (len(in_range_list) <= 1
                or not self.neighbor_manager.local_robot_is_broker()):
            return
        # round-skip: when the candidate pool barely changed since the
        # last dispatched solve, the previous round's published selection
        # already covers it — re-solving only re-spends the budget on its
        # own leftovers (frontend.mac_min_new_candidates, 0 = reference
        # behavior: solve on every timer fire)
        min_new = self.params.get("frontend.mac_min_new_candidates", 0)
        mutations = self.lcm.candidate_selector.pool_mutations
        if (min_new and self._last_solve_mutations is not None
                and mutations - self._last_solve_mutations < min_new):
            profiling.counter("lcd.select_round_skipped")
            return
        t0 = self.ctx.clock.now()
        with profiling.span("lcd.select_dispatch"):
            handle = self.lcm.select_candidates_begin(
                self.params["frontend.inter_robot_loop_closure_budget"],
                in_range)
        if handle is None:
            return
        self._last_solve_mutations = mutations
        self._pending_selection = (handle, in_range_list, t0)
        if not self.params.get("frontend.async_detection", True):
            # synchronous mode: block on the solve inside this round
            self._harvest_selection()

    def _harvest_selection(self, force: bool = True) -> None:
        """Materialize the deferred selection round (if any) and publish
        its descriptor requests. With ``frontend.async_detection`` (the
        default) the MAC solve dispatched by :meth:`detect_inter` crunches
        on-device while keyframe intake continues; the next poll cycle
        harvests it here — the single-host analogue of the reference's
        selection running in its own LCD process. ``force=False`` only
        harvests a solve whose device result is already materialized
        (poll-don't-block: a large-tier FW solve may span several poll
        cycles, and blocking here would re-serialize the detection plane
        behind it); :meth:`detect_inter` forces, because the previous
        round must be applied before new offsets are computed."""
        if self._pending_selection is None:
            return
        if not force:
            pending = self._pending_selection[0].get("pending")
            if pending is not None:
                is_ready = getattr(pending[0], "is_ready", None)
                if is_ready is not None and not is_ready():
                    return
        (handle, in_range_list, t0), self._pending_selection = \
            self._pending_selection, None
        m_before = self.lcm.candidate_selector.pool_mutations
        with profiling.span("lcd.select_harvest"):
            selection = self.lcm.select_candidates_finish(handle)
        if self._last_solve_mutations is not None:
            # the finish itself removes the selected edges from the pool;
            # those mutations are the solve's own doing and must not count
            # toward re-solving (mac_min_new_candidates round-skip)
            self._last_solve_mutations += (
                self.lcm.candidate_selector.pool_mutations - m_before)
        vertices_info = self._edge_list_to_vertices(selection)
        broker = Broker(selection, in_range_list)
        for vertex_set in broker.brokerage(
                self.params["frontend.use_vertex_cover_selection"]):
            for v in vertex_set:
                self.local_descriptors_request_publishers[v[0]].publish(
                    LocalDescriptorsRequest(
                        keyframe_id=v[1],
                        matches_robot_id=vertices_info[v][0],
                        matches_keyframe_id=vertices_info[v][1]))
            self.stats["nb_vertices_transmitted"] += len(vertex_set)
        self.stats["nb_matches_selected"] += len(selection)
        self.stats["sparsification_cumulative_computation_time"] += (
            self.ctx.clock.now() - t0)
        for key in ("sparsification_cumulative_computation_time",
                    "nb_vertices_transmitted", "nb_matches_selected"):
            self._log(key)
        if (self.enable_logs and self.params.get(
                "evaluation.enable_sparsification_comparison", False)):
            # greedy-vs-MAC side-by-side selections (reference gdlcd.py:358-363)
            self.log_matches_publisher.publish(InterRobotMatches(
                robot_id=self.robot_id,
                matches=[InterRobotMatch.from_edge(e) for e in
                         self.lcm.candidate_selector.log_mac_edges]))

    @staticmethod
    def _edge_list_to_vertices(selection) -> Dict[tuple, List[List[int]]]:
        vertices: Dict[tuple, List[List[int]]] = {}
        for s in selection:
            for (me, other) in (((s.robot0_id, s.robot0_keyframe_id),
                                 (s.robot1_id, s.robot1_keyframe_id)),
                                ((s.robot1_id, s.robot1_keyframe_id),
                                 (s.robot0_id, s.robot0_keyframe_id))):
                vertices.setdefault(me, [[], []])
                vertices[me][0].append(other[0])
                vertices[me][1].append(other[1])
        return vertices

    # ------------------------------------------------------------------
    # Geometric-verification outcomes (reference gdlcd.py:449-484)
    # ------------------------------------------------------------------

    def receive_inter_robot_loop_closure(self,
                                         msg: InterRobotLoopClosure) -> None:
        edge = EdgeInterRobot(msg.robot0_id, msg.robot0_keyframe_id,
                              msg.robot1_id, msg.robot1_keyframe_id,
                              self.lcm.candidate_selector.fixed_weight)
        if msg.success:
            self.lcm.candidate_selector.candidate_edges_to_fixed([edge])
            self.stats["nb_matches"] += 1
            self._log("nb_matches")
        else:
            self.lcm.candidate_selector.remove_candidate_edges([edge],
                                                               failed=True)
            self.stats["nb_failed_matches"] += 1
            self._log("nb_failed_matches")

    def _log(self, key: str) -> None:
        if self.enable_logs:
            self.log_publisher.publish(
                KeyValue(key=key, value=str(self.stats[key])))
