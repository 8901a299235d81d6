"""Regenerate the OXFORD_RESULTS.md acceptance table from the artifacts.

ADVICE r3: the §3 table drifted from acceptance/*_metrics.json when rows were
refreshed.  This script derives the table AND the provenance note directly
from acceptance/SUMMARY.json + per-sequence metrics and splices them between
the AUTOGEN markers in OXFORD_RESULTS.md, so doc and artifacts cannot
diverge.  Run after any acceptance refresh:

    python scripts/gen_results_table.py
"""
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ACC = os.path.join(REPO, "acceptance")
DOC = os.path.join(REPO, "OXFORD_RESULTS.md")

BEGIN = "<!-- AUTOGEN:acceptance-table (scripts/gen_results_table.py) -->"
END = "<!-- /AUTOGEN:acceptance-table -->"
BEGIN_R = ("<!-- AUTOGEN:acceptance-table-realistic "
           "(scripts/gen_results_table.py) -->")
END_R = "<!-- /AUTOGEN:acceptance-table-realistic -->"


def build_section(suffix: str = "") -> str:
    summary = json.load(open(os.path.join(ACC, f"SUMMARY{suffix}.json")))
    seqs = []
    failed = []
    for k in sorted(summary):
        if not re.match(r"\d\d-\d\d-\d\d$", k):
            continue
        if "error" in summary[k] or not os.path.exists(
                os.path.join(ACC, f"{k}{suffix}_metrics.json")):
            failed.append(k)   # persisted failure rows must not brick the
            continue           # generator — they get their own note
        seqs.append(k)
    rows = []
    tot = dict(odom_ate=0.0, terr=0.0, rerr=0.0, ate=0.0, ref=0.0)
    pre_gate = []
    for s in seqs:
        m = json.load(open(os.path.join(ACC, f"{s}{suffix}_metrics.json")))
        srow = summary[s]
        beats = srow["slam_ate_m"] < srow["ref_slam_ate_m"]
        if not srow.get("final_gate_config", False):
            pre_gate.append(s)
        rows.append(
            f"| {s} | {m['frames']} | {m['n_loop_closures']} | "
            f"{m['odom']['ate_m']:.2f} | {m['slam']['trans_err_pct']:.3f} | "
            f"{m['slam']['rot_err_degp100m']:.3f} | "
            f"**{m['slam']['ate_m']:.2f}** | {srow['ref_slam_ate_m']:.2f} | "
            f"{'✓' if beats else '✗'} |"
        )
        tot["odom_ate"] += m["odom"]["ate_m"]
        tot["terr"] += m["slam"]["trans_err_pct"]
        tot["rerr"] += m["slam"]["rot_err_degp100m"]
        tot["ate"] += m["slam"]["ate_m"]
        tot["ref"] += srow["ref_slam_ate_m"]
    n = len(seqs)
    beats_n = sum(1 for s in seqs
                  if summary[s]["slam_ate_m"] < summary[s]["ref_slam_ate_m"])
    head = (
        "| Sequence | frames | loops | odom ATE (m) | SLAM t.err (%) | "
        "SLAM r.err (°/100m) | SLAM ATE (m) | ref SLAM ATE | beats ref |\n"
        "|---|---|---|---|---|---|---|---|---|"
    )
    mean = (
        f"| **mean** | | | {tot['odom_ate']/n:.2f} | {tot['terr']/n:.3f} | "
        f"{tot['rerr']/n:.3f} | **{tot['ate']/n:.2f}** | {tot['ref']/n:.2f} "
        f"| **{beats_n}/{n}** |"
    )
    if pre_gate:
        prov = (
            "Provenance (from the `final_gate_config` flags in "
            "`acceptance/SUMMARY.json`): all rows ran under the final "
            f"calibrated odometry-consistency gate EXCEPT {', '.join(pre_gate)},"
            " which predate the gate calibration and are queued for refresh."
        )
    else:
        prov = (
            "Provenance: every row was produced under the final calibrated "
            "odometry-consistency gate configuration (`final_gate_config: "
            "true` for all sequences in `acceptance/SUMMARY.json`)."
        )
    mean_ate = tot["ate"] / n
    mean_ref = tot["ref"] / n
    if suffix == "_realistic":
        blurb = (
            f"**Realistic combined sensor profile** (uint8 quantization + "
            f"calibrated saturation + 0.1° encoder jitter + 5% multipath — "
            f"milder than the single-axis stress ablations in §5): "
            f"**{beats_n} of {n} sequences beat the reference's published "
            f"SLAM ATE** (mean {mean_ate:.2f} m vs {mean_ref:.2f} m) with "
            "the DCS two-stage loop defense active."
        )
        return "\n".join([head] + rows + [mean, "", blurb])
    blurb = (
        f"**{beats_n} of {n} sequences beat the reference's published SLAM "
        f"ATE** (mean {mean_ate:.2f} m vs {mean_ref:.2f} m). Read it "
        "honestly: the returns are simulated, so absolute errors are "
        "optimistic vs real radar; what the table demonstrates is the full "
        "engine — preprocessing, NDT odometry, ScanContext retrieval, CS "
        "gating, loop refinement, odometry-consistency gating, Schur-routed "
        "PGO, re-anchoring — running at full reference scale under the "
        "reference's own configuration, with loop recall diagnostics "
        "(revisit opportunities / no-candidate / CS-rejected / accepted, "
        "per-edge GT error) recorded per sequence."
    )
    if failed:
        prov += (f"  NOTE: {', '.join(failed)} currently carry an error row "
                 "in SUMMARY.json (last run failed) and are excluded above.")
    return "\n".join([head] + rows + [mean, "", blurb, "", prov])


def main():
    doc = open(DOC).read()
    if BEGIN not in doc:
        print(f"ERROR: marker {BEGIN!r} not found in OXFORD_RESULTS.md",
              file=sys.stderr)
        return 1
    section = f"{BEGIN}\n{build_section()}\n{END}"
    new = re.sub(re.escape(BEGIN) + r".*?" + re.escape(END), section, doc,
                 flags=re.S)
    if (BEGIN_R in new
            and os.path.exists(os.path.join(ACC, "SUMMARY_realistic.json"))):
        section_r = f"{BEGIN_R}\n{build_section('_realistic')}\n{END_R}"
        new = re.sub(re.escape(BEGIN_R) + r".*?" + re.escape(END_R),
                     section_r, new, flags=re.S)
    open(DOC, "w").write(new)
    print("OXFORD_RESULTS.md acceptance table(s) regenerated from artifacts")
    return 0


if __name__ == "__main__":
    sys.exit(main())
