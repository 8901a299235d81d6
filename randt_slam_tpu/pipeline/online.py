"""Online (incremental) SLAM: the reference's live mode, ROS-free.

``NDTSlam::initializeOnline`` (``RS/src/ndt_slam/ndt_slam.cpp:67-92``) runs
the front end on the subscriber callback plus three timers (loop search, pose
-graph optimization, raytracing) that mutate shared state under mutexes.  The
TPU build keeps the same cadences but runs them synchronously between frames
on functional state — deterministic, lock-free, and with the one feedback
path the offline mode lacks: pose-graph results re-anchor the ACTIVE submap
(``LocalFuser::updateSubmaps``), steering subsequent odometry and edges.

Cadences (configurable, defaults match the reference timer frequencies at the
4 Hz radar rate):
  * loop search every ``loop_every`` frames  (0.8 Hz timer -> ~5 frames)
  * PGO + re-anchoring every ``pgo_every`` frames (0.2 Hz -> ~20 frames),
    with the reference's ``max_update_index`` gating of loop edges
    (``ndt_slam.cpp:351-360``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..geometry import compose, inverse
from ..graph import pose_graph as PG
from ..loops import scancontext as SC
from ..ndt import cells as C
from ..ndt import divergence as D
from ..registration import matcher
from . import frontend as F


class OnlineSlam:
    """Incremental driver: feed frames one at a time, read poses/graph."""

    def __init__(self, cfg: SlamConfig, sensor_to_base=None,
                 initial_pose=None, loop_every: int = 5, pgo_every: int = 20):
        self.cfg = cfg
        self.s2b = jnp.zeros(3) if sensor_to_base is None else jnp.asarray(
            sensor_to_base, jnp.float32)
        self.carry = F.init_carry(cfg, initial_pose=initial_pose)
        self.loop_every = loop_every
        self.pgo_every = pgo_every
        self._step = jax.jit(partial(F.frontend_step, cfg,
                                     sensor_to_base=self.s2b))
        self._features = jax.jit(self._node_features)
        self._refine = jax.jit(partial(self._refine_and_gate, cfg))
        # Padded ScanContext database: fixed (max_nodes, ...) shapes so the
        # jitted detector never recompiles as keyframes accumulate (the
        # incremental kd-tree rebuild of ``Scancontext.cpp:275-287`` becomes
        # one static-shape kNN).
        cap = cfg.capacity.max_nodes
        sc = cfg.scan_context
        self._sc_desc = np.zeros((cap, sc.num_ring, sc.num_sector), np.float32)
        self._sc_key = np.zeros((cap, sc.num_ring), np.float32)
        self._sc_pos = np.zeros((cap, 2), np.float32)
        self._sc_trav = np.zeros((cap,), np.float32)
        self._detect = jax.jit(partial(SC.detect, cfg=sc))
        self._frame_count = 0
        # host-side graph state (the reference's nodes_/edges_ containers)
        self.node_pose: list[np.ndarray] = []
        self.node_stamp: list[float] = []
        self.node_traversed: list[float] = []
        self.node_submap: list[int] = []
        self.node_frame: list[int] = []
        self.node_is_root: list[bool] = []
        self.edges: list[tuple] = []  # (begin, end, trans, sqrtI)
        self.n_loop_edges = 0
        # ScanContext database
        self.sc_desc: list[np.ndarray] = []
        self.sc_keys: list[np.ndarray] = []
        self._pending_loop_queries: list[int] = []
        self._node_cells: dict[int, tuple] = {}
        self._recent_frames: dict[int, object] = {}
        self.odom_trace: list[np.ndarray] = []

    # -- helpers -------------------------------------------------------------

    @staticmethod
    def _refine_and_gate(cfg, guess, f_mean, f_cov, f_valid,
                         m_mean, m_cov, m_valid):
        """GNC loop refinement + CS-divergence gate as one jitted call
        (``estimateLoopConstraint`` + ``calculateCSDivergence``)."""
        est = matcher.estimate_loop(cfg, guess, f_mean, f_cov, f_valid,
                                    m_mean, m_cov, m_valid)
        mm2, mc2 = matcher.transform_mean_cov(est.pose, m_mean, m_cov)
        cs = D.cs_divergence(f_mean, f_cov, f_valid, mm2, mc2, m_valid)
        return est.pose, cs

    def _node_features(self, frame):
        scan, filt = F.build_scan_cells(self.cfg, frame, self.s2b)
        desc = SC.make_descriptor(
            filt.polar, filt.points[:, 2], filt.mask, self.cfg.scan_context
        )
        return scan, desc

    def _record_outputs(self, frame, out):
        nodes = jax.tree.map(np.asarray, out.nodes)
        edges = jax.tree.map(np.asarray, out.edges)
        for k in range(2):
            if not nodes.valid[k]:
                continue
            nid = int(nodes.node_id[k])
            assert nid == len(self.node_pose)
            self.node_pose.append(nodes.pose[k])
            self.node_stamp.append(float(nodes.stamp[k]))
            self.node_traversed.append(float(nodes.traversed[k]))
            self.node_submap.append(int(nodes.submap_id[k]))
            self.node_frame.append(int(nodes.frame_idx[k]))
            self.node_is_root.append(bool(nodes.is_root[k]))
            # ScanContext insert (``makeAndSaveScancontextAndKeys``).  Nodes
            # are emitted ``insertion_delay`` frames late, so pull the node's
            # own frame from the short history buffer.
            fr = self._recent_frames.get(int(nodes.frame_idx[k]), frame)
            scan, desc = self._features(fr)
            self.sc_desc.append(np.asarray(desc))
            self.sc_keys.append(np.asarray(SC.ring_key(desc)))
            if nid < self._sc_desc.shape[0]:
                self._sc_desc[nid] = self.sc_desc[-1]
                self._sc_key[nid] = self.sc_keys[-1]
                self._sc_pos[nid] = nodes.pose[k][:2]
                self._sc_trav[nid] = nodes.traversed[k]
            self._node_cells[nid] = (scan.mean, scan.cov, scan.valid)
            if not bool(nodes.is_root[k]):
                self._pending_loop_queries.append(nid)
        for k in range(2):
            if edges.valid[k]:
                self.edges.append((
                    int(edges.id_begin[k]), int(edges.id_end[k]),
                    edges.trans[k], edges.sqrt_information[k],
                ))

    # -- public API ------------------------------------------------------------

    def process_frame(self, frame) -> np.ndarray:
        """One radar frame; returns the current global pose (/ndt_odom)."""
        self._recent_frames[int(frame.index)] = frame
        horizon = self.cfg.local_fuser.insertion_delay + 4
        for k in list(self._recent_frames):
            if k < int(frame.index) - horizon:
                del self._recent_frames[k]
        self.carry, out = self._step(self.carry, frame)
        self._record_outputs(frame, out)
        self.odom_trace.append(np.asarray(out.odom_pose))
        self._frame_count += 1
        if self._frame_count % self.loop_every == 0:
            self.detect_loops()
        if self._frame_count % self.pgo_every == 0:
            self.optimize_pose_graph()
        return self.odom_trace[-1]

    def detect_loops(self):
        """``LocalFuser::detectLoopClosures`` over the pending keyframe queue."""
        cfg = self.cfg
        N = min(len(self.sc_desc), self._sc_desc.shape[0])
        if N == 0:
            self._pending_loop_queries.clear()
            return
        descs = jnp.asarray(self._sc_desc)
        keys = jnp.asarray(self._sc_key)
        positions = jnp.asarray(self._sc_pos)
        dists = jnp.asarray(self._sc_trav)
        for q in self._pending_loop_queries:
            if q >= N:  # beyond the padded capacity — cannot query
                continue
            cand = self._detect(jnp.int32(q), descs, keys, positions, dists,
                                jnp.int32(N))
            m = int(cand.match_id)
            if m < 0 or self.node_submap[m] == self.node_submap[q]:
                continue
            sub = self.node_submap[m]
            root = int(np.asarray(self.carry.store_root)[sub])
            root_pose = jnp.asarray(self.node_pose[root])
            match_pose = jnp.asarray(self.node_pose[m])
            yaw = float(cand.yaw_rad)
            guess = compose(
                compose(inverse(root_pose), match_pose),
                jnp.asarray([0.0, 0.0, -yaw], jnp.float32),
            )
            f_stats = C.CellStats(
                n=self.carry.store_cells.n[sub],
                s=self.carry.store_cells.s[sub],
                ss=self.carry.store_cells.ss[sub],
            )
            cc = cfg.ndt_map.cell
            f_mean, f_cov = C.mean_cov(f_stats, cc.eig_floor_ratio,
                                       cc.intensity_var_jitter,
                                       use_pndt=cc.use_pndt)
            f_valid = C.valid_mask(f_stats, cfg.ndt_map.min_points_per_cell)
            m_mean, m_cov, m_valid = self._node_cells[q]
            pose, cs = self._refine(guess, f_mean, f_cov, f_valid,
                                    m_mean, m_cov, m_valid)
            if float(cs) < cfg.local_fuser.loop_closure_max_cs_divergence:
                sqrtI = cfg.local_fuser.loop_closure_weight * np.asarray(
                    cfg.local_fuser.loop_sqrt_information, np.float32)
                self.edges.append((root, q, np.asarray(pose), sqrtI))
                self.n_loop_edges += 1
        self._pending_loop_queries.clear()

    def optimize_pose_graph(self):
        """``NDTSlam::optimizePoseGraph`` + ``LocalFuser::updateSubmaps``."""
        cfg = self.cfg
        N = len(self.node_pose)
        if N < 2 or not self.edges or self.n_loop_edges == 0:
            return
        lf = cfg.local_fuser
        n_per = int(np.ceil(
            (lf.submap_size_poses - (cfg.matcher.smoothing_steps - 1))
            / lf.insertion_step
        ))
        max_update = (N - 1) // n_per * n_per  # ``ndt_slam.cpp:354-355``
        E = len(self.edges)
        g = PG.PoseGraph(
            poses=jnp.asarray(np.stack(self.node_pose), jnp.float32),
            id_begin=jnp.asarray([e[0] for e in self.edges], jnp.int32),
            id_end=jnp.asarray([e[1] for e in self.edges], jnp.int32),
            trans=jnp.asarray(np.stack([e[2] for e in self.edges]), jnp.float32),
            sqrt_information=jnp.asarray(
                np.stack([e[3] for e in self.edges]), jnp.float32),
            valid=jnp.ones(E, bool),
        )
        poses, _ = PG.optimize(g, cfg.global_fuser, max_update_index=max_update)
        poses = np.asarray(poses)
        for i in range(N):
            self.node_pose[i] = poses[i]
        # Re-anchor: the ACTIVE submap origin moves to its root node's
        # optimized pose and the last emitted node is refreshed, steering
        # subsequent odometry/edges (``updateSubmaps``, ``local_fuser.cpp:65-88``).
        cur_sub = int(self.carry.n_finished)
        root = int(np.asarray(self.carry.store_root)[
            min(cur_sub, self.cfg.capacity.max_submaps - 1)])
        if root < N:
            self.carry = self.carry._replace(
                submap_origin=jnp.asarray(poses[root], jnp.float32),
                last_node_pose=jnp.asarray(poses[N - 1], jnp.float32),
            )

    def trajectory(self):
        return np.stack(self.node_pose) if self.node_pose else np.zeros((0, 3))
