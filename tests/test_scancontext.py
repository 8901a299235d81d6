import numpy as np
import jax
import jax.numpy as jnp

from randt_slam_tpu.config import ScanContextConfig
from randt_slam_tpu.loops import scancontext as SC


def cfg_small():
    return ScanContextConfig(num_ring=10, num_sector=24, max_radius=50.0,
                             num_exclude_recent=3, num_candidates=3,
                             dist_threshold=0.5, odom_weight=0.0)


def random_cloud(rng, n=200, rmax=45.0):
    ang = rng.uniform(-np.pi, np.pi, n).astype(np.float32)
    rr = rng.uniform(2.0, rmax, n).astype(np.float32)
    inten = rng.uniform(50, 150, n).astype(np.float32)
    return ang, rr, inten


def make_desc(ang, rr, inten, cfg):
    polar = jnp.stack([jnp.asarray(ang), jnp.asarray(rr)], axis=-1)
    return SC.make_descriptor(polar, jnp.asarray(inten), jnp.ones(len(ang), bool), cfg)


def test_descriptor_binning_and_legacy_offset():
    cfg = cfg_small()
    # one point at range 25 (ring ceil(25/50*10)=5 -> idx 4), angle 0+ ->
    # sector ceil(eps/360*24)=1 -> idx 0
    d = make_desc(np.asarray([0.001]), np.asarray([25.0]), np.asarray([100.0]), cfg)
    d = np.asarray(d)
    assert d.shape == (10, 24)
    # occupied bin carries sum_z - 1000 (legacy NO_POINT offset)
    assert np.isclose(d[4, 0], 100.0 * cfg.intensity_factor - 1000.0)
    assert (d != 0).sum() == 1


def test_rotation_shifts_descriptor():
    cfg = cfg_small()
    rng = np.random.default_rng(0)
    ang, rr, inten = random_cloud(rng)
    d1 = make_desc(ang, rr, inten, cfg)
    shift_sectors = 5
    dth = shift_sectors * 2 * np.pi / cfg.num_sector
    d2 = make_desc(ang + dth, rr, inten, cfg)
    # d2 should equal d1 circ-shifted by shift_sectors columns
    np.testing.assert_allclose(
        np.asarray(d2), np.roll(np.asarray(d1), shift_sectors, axis=1), atol=1e-3
    )


def test_pair_distance_recovers_rotation():
    cfg = cfg_small()
    rng = np.random.default_rng(1)
    ang, rr, inten = random_cloud(rng, n=400)
    d1 = make_desc(ang, rr, inten, cfg)
    shift = 7
    dth = shift * 2 * np.pi / cfg.num_sector
    d2 = make_desc(ang + dth, rr, inten, cfg)
    pos = jnp.zeros(2)
    dist, best = SC.pair_distance(d1, d2, pos, pos, jnp.asarray(100.0),
                                  jnp.asarray(10.0), cfg)
    assert float(dist) < 0.05
    # Convention (matches ``circshift``/``distanceBtnScanContext``): the
    # CANDIDATE (second argument) is shifted to align with the query.  Here
    # d2 = roll(d1, +shift), so alignment happens at S - shift.
    assert int(best) == (cfg.num_sector - shift) % cfg.num_sector
    # With roles as in retrieval (query rotated w.r.t. candidate) the shift
    # equals the rotation directly.
    dist2, best2 = SC.pair_distance(d2, d1, pos, pos, jnp.asarray(100.0),
                                    jnp.asarray(10.0), cfg)
    assert int(best2) == shift


def test_pair_distance_penalizes_odometry_mismatch():
    cfg = ScanContextConfig(num_ring=10, num_sector=24, max_radius=50.0,
                            odom_weight=0.1, assumed_drift=0.05, odom_eps=1.0)
    rng = np.random.default_rng(2)
    ang, rr, inten = random_cloud(rng)
    d = make_desc(ang, rr, inten, cfg)
    near, _ = SC.pair_distance(d, d, jnp.zeros(2), jnp.asarray([1.0, 0.0]),
                               jnp.asarray(100.0), jnp.asarray(10.0), cfg)
    far, _ = SC.pair_distance(d, d, jnp.zeros(2), jnp.asarray([80.0, 0.0]),
                              jnp.asarray(100.0), jnp.asarray(10.0), cfg)
    assert float(far) > float(near)


def test_detect_finds_revisit():
    cfg = cfg_small()
    rng = np.random.default_rng(3)
    N = 10
    descs, keys = [], []
    clouds = [random_cloud(rng) for _ in range(N)]
    # make keyframe 8 a rotated revisit of keyframe 1
    ang, rr, inten = clouds[1]
    clouds[8] = (ang + 3 * 2 * np.pi / cfg.num_sector, rr, inten)
    for a, r, i in clouds:
        d = make_desc(a, r, i, cfg)
        descs.append(d)
        keys.append(SC.ring_key(d))
    descs = jnp.stack(descs)
    keys = jnp.stack(keys)
    positions = jnp.zeros((N, 2))
    dists = jnp.asarray(np.arange(N) * 10.0)
    res = SC.detect(jnp.int32(8), descs, keys, positions, dists, jnp.int32(N), cfg)
    assert int(res.match_id) == 1
    expected_yaw = 3 * 2 * np.pi / cfg.num_sector
    np.testing.assert_allclose(float(res.yaw_rad), expected_yaw, atol=1e-6)
    # queries too early must return -1 (num_exclude_recent)
    res2 = SC.detect(jnp.int32(2), descs, keys, positions, dists, jnp.int32(N), cfg)
    assert int(res2.match_id) == -1
