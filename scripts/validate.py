"""Regenerate the validation traces in validation/ on real hardware.

Runs the headline benchmark configurations end to end through the CLI
driver and refreshes the stored forces.txt traces + summary statistics.
Budget on one TPU v5e chip: ~5 min (2D-1) + ~4 min (2D-2 T=8) + ~10 min
(3D-2Z) + ~11 min (2D-2 T=25); pass case names to run a subset.

    python scripts/validate.py            # all cases
    python scripts/validate.py 2d1 2d2    # subset
"""

import os
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

# Current-default (P1-coarse-preconditioned) trace names; the bare-name
# files in validation/ are the older Jacobi-preconditioned generation
# (kept for the tolerance-error comparison, see validation/README.md).
RUNS = {
    "2d1": (
        ["--case", "2D-1", "--mesh", "/root/reference/meshes/mesh-2D-100.msh",
         "--steps", "50"],
        "forces_2d1_mesh-2D-100_tpu_f32_p1coarse.txt",
    ),
    "2d2": (
        ["--case", "2D-2", "--mesh", "/root/reference/meshes/mesh-2D-100.msh",
         "--deltat", "0.01"],
        "forces_2d2_mesh-2D-100_tpu_f32_p1coarse.txt",
    ),
    "2d3": (
        ["--case", "2D-3", "--mesh", "/root/reference/meshes/mesh-2D-100.msh"],
        "forces_2d3_mesh-2D-100_tpu_f32_p1coarse.txt",
    ),
    "2d2_t25": (
        ["--case", "2D-2", "--mesh", "/root/reference/meshes/mesh-2D-100.msh",
         "--deltat", "0.01", "--T", "25"],
        "forces_2d2_T25_mesh-2D-100_tpu_f32_p1coarse.txt",
    ),
    "3d1z": (
        ["--case", "3D-1Z", "--mesh", os.path.join(REPO, "meshes/mesh-3D-medium.msh"),
         "--steps", "50"],
        "forces_3d1z_mesh-3D-medium_tpu_f32_p1coarse.txt",
    ),
    "3d2z": (
        ["--case", "3D-2Z", "--mesh", os.path.join(REPO, "meshes/mesh-3D-medium.msh")],
        "forces_3d2z_mesh-3D-medium_tpu_f32_p1coarse.txt",
    ),
    "3d3z": (
        ["--case", "3D-3Z", "--mesh", os.path.join(REPO, "meshes/mesh-3D-medium.msh")],
        "forces_3d3z_mesh-3D-medium_tpu_f32_p1coarse.txt",
    ),
    # Corridor-closure rung (~45 min on one chip; not in the default set).
    # --criterion rhs is EXPLICIT: gmres_criterion="auto" (the default)
    # selects "defect" above 500k dofs, which is the 3x-iterations
    # companion below — this entry is the validated-cost 'rhs' variant.
    "2d2_855k": (
        ["--case", "2D-2", "--mesh", os.path.join(REPO, "meshes/mesh-2D-gen-xfine.msh"),
         "--deltat", "0.0025", "--operator-path", "tile", "--tile-elements", "16",
         "--criterion", "rhs"],
        "forces_2d2_855k_dt0.0025_tpu_f32_tile.txt",
    ),
    # Tolerance-sensitivity companion: same rung, defect-normalized stopping
    # (~3x the iterations) — separates mesh error from tolerance error in
    # the corridor misses (580k: Dp 1.2% low, Cd_max 1% high).
    "2d2_855k_defect": (
        ["--case", "2D-2", "--mesh", os.path.join(REPO, "meshes/mesh-2D-gen-xfine.msh"),
         "--deltat", "0.0025", "--operator-path", "tile", "--tile-elements", "16",
         "--criterion", "defect"],
        "forces_2d2_855k_dt0.0025_tpu_f32_tile_defect.txt",
    ),
    # Steady-3D dP margin rung: 3D-1Z on the 666k-dof mesh (the medium-mesh
    # trace sits at dP=0.180 vs the [0.165, 0.175] corridor, +3% — a
    # resolution miss; Newton runs the host driver at this size).
    "3d1z_fine": (
        ["--case", "3D-1Z", "--mesh", os.path.join(REPO, "meshes/mesh-3D-fine.msh"),
         # Reference-semantics fixed forcing.  An EW+reuse variant was
         # measured DIVERGENT here (round 4): every step's Newton stalled
         # at ||R||~2e-3 from iteration 0 — the eta_max=0.5 first solves
         # are too loose for the stiff 3D SUPG dt=0.1 system and EW
         # choice 2 only loosens further on stagnation.  EW stays a 2D-1
         # win (docs/DESIGN.md round-4 Newton section).
         "--steps", "50"],
        "forces_3d1z_mesh-3D-fine_tpu_f32.txt",
    ),
    # Spanwise-anisotropy discriminator for the 3D-1Z dP miss: same
    # in-plane h as mesh-3D-medium, spanwise layers doubled (see
    # scripts/gen_meshes.py).  dP toward [0.165, 0.175] here indicts the
    # spanwise spacing; unchanged dP rules it out.
    "3d1z_z16": (
        ["--case", "3D-1Z", "--mesh",
         os.path.join(REPO, "meshes/mesh-3D-medium-z16.msh"),
         "--steps", "50"],
        "forces_3d1z_mesh-3D-medium-z16_tpu_f32.txt",
    ),
    # The 1.36M-dof rung with the defect criterion — the preset 'rhs'
    # tolerance freezes and produces non-physics at this scale
    # (docs/DESIGN.md "accuracy cliff").  rtol 1e-2 is the REFERENCE's own
    # linearized SolverControl level (NavierStokes.cpp:836); the 1e-5*||b||
    # floor bounds per-step backward error 10x under the measured cliff.
    # The repo's default rtol=1e-4 against the 1e-6 floor costs ~170
    # its/step (~70 s/step) at this scale for no measurable physics gain
    # (docs/DESIGN.md round-3 measurements); ~3h on one chip as configured.
    "3d2z_xfine": (
        ["--case", "3D-2Z", "--mesh", os.path.join(REPO, "meshes/mesh-3D-xfine.msh"),
         "--criterion", "defect", "--rtol", "1e-2", "--defect-floor", "1e-5"],
        "forces_3d2z_mesh-3D-xfine_tpu_f32_defect.txt",
    ),
}
DEFAULT_SKIP = {"2d2_855k", "2d2_855k_defect", "3d2z_xfine", "3d1z_fine",
                "3d1z_z16"}

# ---------------------------------------------------------------------------
# Segmented long rungs.
#
# The at-scale traces (855k-dof 2D corridor, 1.36M-dof resolved 3D) take
# multiple hours of chip time — longer than one build round, and /tmp does
# NOT persist across rounds.  A segmented rung advances in bounded chunks:
# each invocation resumes from a checkpoint COMMITTED under
# validation/checkpoints/, runs up to VALIDATE_SEG_STEPS more steps,
# appends the new forces rows to a committed partial trace, and refreshes
# the checkpoint.  When total_steps is reached the partial trace is
# promoted to its final validation/ name.  Checkpoints are layout-
# independent full marching state (utils/checkpoint.py), ~7-11 MB npz at
# these scales.
#
#   python scripts/validate.py 2d2_855k_seg          # one segment
#   VALIDATE_SEG_STEPS=800 python scripts/validate.py 2d2_855k_seg
#
# ``phases`` switches flags at a global step boundary (a segment never
# crosses a phase boundary): the xfine rung runs the inlet ramp warm-
# started (fast — every solve sees a changing RHS) and the developed tail
# with zero-guess solves at the reference's own SolverControl semantics
# (rtol 1e-2, NavierStokes.cpp:836,849) — the warm-started defect floor
# provably freezes there (validation/README.md, round-2/3 history).
SEGMENTED = {
    "2d2_855k_seg": {
        "args": ["--case", "2D-2", "--mesh",
                 os.path.join(REPO, "meshes/mesh-2D-gen-xfine.msh"),
                 "--deltat", "0.0025", "--operator-path", "tile",
                 # te=32 + the round-4 auto clustering: 3.26M padded slots
                 # vs 3.69M at the round-3 te=16 pin (docs/DESIGN.md).
                 "--tile-elements", "32", "--criterion", "rhs"],
        "total_steps": 3200,
        "seg_steps": 400,
        "ckpt": "validation/checkpoints/2d2_855k.npz",
        "partial": "validation/partial_forces_2d2_855k.txt",
        "final": "forces_2d2_855k_dt0.0025_tpu_f32_tile.txt",
    },
    # Extension of 2d2_855k_seg past T=8: at 855k dofs the shedding is
    # still GROWING at t=8 (Cl amplitude reaches +-1.05 only in the last
    # half-second; 15 Cl zero-crossings in [4,8] vs 24 on the 580k rung),
    # so the DFG corridor statistics — defined over fully-developed
    # periods — need a longer horizon, exactly like the T=25 run on
    # mesh-2D-100.  Seeded from the step-3200 checkpoint of the completed
    # T=8 rung with the T=8 trace as the committed partial; promotion
    # REPLACES the T=8 trace with the full T=14 one.
    "2d2_855k_ext_seg": {
        "args": ["--case", "2D-2", "--mesh",
                 os.path.join(REPO, "meshes/mesh-2D-gen-xfine.msh"),
                 "--deltat", "0.0025", "--operator-path", "tile",
                 "--tile-elements", "32", "--criterion", "rhs"],
        "total_steps": 5600,
        "seg_steps": 400,
        "ckpt": "validation/checkpoints/2d2_855k_ext.npz",
        "partial": "validation/partial_forces_2d2_855k_ext.txt",
        "final": "forces_2d2_855k_dt0.0025_tpu_f32_tile.txt",
    },
    # Developed-cycle measurement window for the 855k rung at the DEFECT
    # criterion.  The T=14 'rhs' trace saturates into a clean limit cycle
    # at St 0.273; a 400-step defect continuation snaps the frequency to
    # St 0.3015 (in corridor) within ONE period — the pinned 'rhs'
    # stopping is scale-unsafe at 855k dofs (the gmres_criterion="auto"
    # >500k-dof heuristic exists for exactly this).  This rung gives the
    # defect-resolved cycle 4 s (t in [14, 18], ~11 periods) to fully
    # settle amplitude/Cd_max/dP for the corridor statistics.  Seeded
    # from checkpoints/2d2_855k_T14_state.npz + a header-only partial.
    "2d2_855k_defect_tail_seg": {
        "args": ["--case", "2D-2", "--mesh",
                 os.path.join(REPO, "meshes/mesh-2D-gen-xfine.msh"),
                 "--deltat", "0.0025", "--operator-path", "tile",
                 "--tile-elements", "32", "--criterion", "defect"],
        "total_steps": 7200,
        "seg_steps": 400,
        "ckpt": "validation/checkpoints/2d2_855k_defect_tail.npz",
        "partial": "validation/partial_forces_2d2_855k_defect_tail.txt",
        "final": "forces_2d2_855k_T14-18_dt0.0025_tpu_f32_tile_defect.txt",
    },
    # Wake-corrected mesh-sensitivity rung (~696k dofs, mesh-2D-gen-xfine2:
    # h_far=0.012, h_cyl=0.0015).  Built when the 855k T=14 'rhs' cycle sat
    # off-corridor and far-field grading was the leading hypothesis; the
    # defect-criterion tail then closed the corridor on the ORIGINAL 855k
    # mesh (St 0.3017/Cd_max 3.2278/dP 2.484 — tolerance artifact, PARITY
    # #11), so this rung is now an optional mesh-sensitivity study, not a
    # corridor requirement.  Its two-phase protocol (cheap 'rhs' transient,
    # 'defect' measurement window) is the standard for >500k-dof rungs.
    "2d2_700k_seg": {
        "args": ["--case", "2D-2", "--mesh",
                 os.path.join(REPO, "meshes/mesh-2D-gen-xfine2.msh"),
                 "--deltat", "0.0025", "--operator-path", "tile",
                 "--tile-elements", "32"],
        # 'rhs' is scale-unsafe at >500k dofs (855k finding: it slows the
        # developed vortex street 9%); run the transient cheaply under
        # 'rhs' and the measurement window under 'defect' (the cycle
        # re-locks within one period, measured).
        "phases": [(0, ["--criterion", "rhs"]),
                   (3600, ["--criterion", "defect"])],
        "total_steps": 4800,
        "seg_steps": 400,
        "ckpt": "validation/checkpoints/2d2_700k.npz",
        "partial": "validation/partial_forces_2d2_700k.txt",
        "final": "forces_2d2_700k_dt0.0025_tpu_f32_tile.txt",
    },
    # 1.36M-dof tail protocol (round 5, measured): a zero-guess step at
    # this scale costs ~150 s (full defect reduction from x0=0 every
    # step) vs ~15 s warm-started at floor 1e-5 — 388 zero-guess steps
    # would be ~16 h, beyond one round's chip budget.  And the
    # floor-1e-5 warm tail FREEZES (0-iteration accepts, README).  So
    # the tail runs (a) a 25-step ZERO-GUESS WINDOW (steps 412-437:
    # literal reference Krylov semantics, cpp:849/560 — the unfrozen
    # anchor), then (b) a warm-started continuation with the floor
    # LOWERED to 1e-6 (the README's named outstanding experiment:
    # under the freeze threshold, ~170 its/step ≈ 70 s/step measured),
    # same defect criterion — the reference's defect-reduction contract
    # (PARITY.md #11).
    "3d2z_xfine_seg": {
        "args": ["--case", "3D-2Z", "--mesh",
                 os.path.join(REPO, "meshes/mesh-3D-xfine.msh"),
                 "--criterion", "defect", "--rtol", "1e-2",
                 "--defect-floor", "1e-5"],
        "phases": [(0, []), (412, ["--no-warm-start"]),
                   (437, ["--defect-floor", "1e-6"])],
        "total_steps": 800,
        "seg_steps": 100,
        "ckpt": "validation/checkpoints/3d2z_xfine.npz",
        "partial": "validation/partial_forces_3d2z_xfine.txt",
        "final": "forces_3d2z_mesh-3D-xfine_tpu_f32_unfrozen_tail.txt",
    },
}


def run_segment(name: str) -> int:
    import numpy as np

    spec = SEGMENTED[name]
    ck = os.path.join(REPO, spec["ckpt"])
    partial = os.path.join(REPO, spec["partial"])
    os.makedirs(os.path.dirname(ck), exist_ok=True)
    step0 = 0
    if os.path.exists(ck):
        with np.load(ck) as z:
            step0 = int(z["step"])
    total = spec["total_steps"]
    if step0 >= total:
        # Finish a promotion interrupted between the move and the ckpt
        # removal: if the partial still exists, promote it now.
        if os.path.exists(partial):
            shutil.move(partial, os.path.join(REPO, "validation", spec["final"]))
        os.remove(ck)
        print(f"=== {name}: already complete at step {step0}/{total}")
        return 0
    seg = int(os.environ.get("VALIDATE_SEG_STEPS", spec["seg_steps"]))
    seg = min(seg, total - step0)
    extra = []
    for ps, flags in spec.get("phases", []):
        if step0 >= ps:
            extra = flags
    nxt = [ps for ps, _ in spec.get("phases", []) if ps > step0]
    if nxt:
        seg = min(seg, min(nxt) - step0)
    outdir = f"/tmp/validate_{name}"
    shutil.rmtree(outdir, ignore_errors=True)
    os.makedirs(outdir)
    cmd = [sys.executable, os.path.join(REPO, "main.py"), *spec["args"], *extra,
           "--steps", str(seg), "--checkpoint-every", "100",
           "--output-dir", outdir, "--quiet"]
    if step0:
        cmd += ["--resume", ck]
    print(f"=== {name}: steps {step0}->{step0 + seg} of {total}: "
          f"main.py {' '.join(cmd[2:])}", flush=True)
    subprocess.run(cmd, check=True, cwd=REPO)
    with open(os.path.join(outdir, "forces.txt")) as f:
        rows = f.readlines()[1:]
    # Idempotent, crash-safe commit of (partial trace, checkpoint).  The
    # driver exists because processes die at round boundaries: a kill
    # between the two writes must not corrupt the trace that is later
    # promoted to validation/.  Rules:
    #   * partial rows are deduplicated by Time against what is already
    #     committed (a replayed segment appends nothing twice);
    #   * both files are written to temps and os.replace'd (atomic);
    #   * partial first, checkpoint second — if killed in between, the
    #     rerun replays the segment and the dedup drops the duplicates.
    prev = ["Time\tCd\tCl\tDeltaP\n"]
    if step0:
        if not os.path.exists(partial):
            raise SystemExit(
                f"{name}: checkpoint records step {step0} but the committed "
                f"partial trace {partial} is missing — refusing to fabricate "
                "a headerless trace; restore the partial or delete the "
                "checkpoint to restart the rung from step 0.")
        with open(partial) as f:
            prev = f.readlines()
        if not prev or not prev[0].startswith("Time"):
            raise SystemExit(
                f"{name}: {partial} does not start with the 'Time' header — "
                "corrupted partial; restore it or restart the rung.")
    last_t = float(prev[-1].split("\t")[0]) if len(prev) > 1 else -1.0
    new_rows = [r for r in rows if float(r.split("\t")[0]) > last_t + 1e-12]
    if len(new_rows) != len(rows):
        print(f"    (dedup: dropped {len(rows) - len(new_rows)} replayed rows)")
    with open(partial + ".tmp", "w") as f:
        f.writelines(prev)
        f.writelines(new_rows)
    os.replace(partial + ".tmp", partial)
    shutil.copy(os.path.join(outdir, "checkpoint.npz"), ck + ".tmp")
    os.replace(ck + ".tmp", ck)
    done = step0 + seg
    if done >= total:
        dst = os.path.join(REPO, "validation", spec["final"])
        shutil.move(partial, dst)
        os.remove(ck)
        print(f"    -> COMPLETE: {dst}")
    else:
        print(f"    -> {done}/{total} steps; partial {partial}, ckpt {ck}")
    return 0


def main(argv):
    names = argv or [n for n in RUNS if n not in DEFAULT_SKIP]
    for name in names:
        if name in SEGMENTED:
            run_segment(name)
            continue
        args, out_name = RUNS[name]
        outdir = f"/tmp/validate_{name}"
        shutil.rmtree(outdir, ignore_errors=True)
        print(f"=== {name}: main.py {' '.join(args)}", flush=True)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "main.py"), *args,
             "--output-dir", outdir, "--quiet"],
            check=True,
            cwd=REPO,
        )
        dst = os.path.join(REPO, "validation", out_name)
        shutil.copy(os.path.join(outdir, "forces.txt"), dst)
        print(f"    -> {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
