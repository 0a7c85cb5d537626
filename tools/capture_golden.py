"""Regenerate tests/golden_reference.py by EXECUTING the reference code.

Workflow (all scratch work in /tmp/goldharness, nothing copied into the repo):

1. Copy /root/reference/common/{pose_utils,criterion}.py to a scratch dir and
   convert py2 syntax with 2to3 (print statements, xrange).
2. Apply three mechanical py3/numpy-2 compatibility patches (documented
   below) that do not change numerical behavior.
3. Provide a scipy-backed shim for the external ``transforms3d`` package
   (only the five functions the reference uses), so the goldens do not
   depend on this repo's own geometry code.
4. Run the reference implementation on fixed hand-written inputs and write
   inputs + outputs as literals to tests/golden_reference.py.

Usage: python tools/capture_golden.py  (requires /root/reference mounted)
"""

import pathlib
import shutil
import subprocess
import sys

SCRATCH = pathlib.Path("/tmp/goldharness")
REF = pathlib.Path("/root/reference/common")

QUATERNIONS_SHIM = '"""Minimal scipy-backed stand-in for transforms3d.quaternions.\n\nOnly the functions the reference\'s common/pose_utils.py uses. Quaternion\nlayout is scalar-first [w, x, y, z] like transforms3d; scipy uses [x, y, z, w]\nso we convert at the boundary. mat2quat returns w >= 0 (canonical), matching\ntransforms3d\'s eigenvector method sign convention.\n"""\n\nimport numpy as np\nfrom scipy.spatial.transform import Rotation\n\n\ndef mat2quat(M):\n    q = Rotation.from_matrix(np.asarray(M, float)).as_quat(canonical=True)\n    return np.array([q[3], q[0], q[1], q[2]])\n\n\ndef quat2mat(q):\n    w, x, y, z = np.asarray(q, float)\n    return Rotation.from_quat([x, y, z, w]).as_matrix()\n\n\ndef qmult(q1, q2):\n    w1, x1, y1, z1 = np.asarray(q1, float)\n    w2, x2, y2, z2 = np.asarray(q2, float)\n    return np.array(\n        [\n            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,\n            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,\n            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,\n            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,\n        ]\n    )\n\n\ndef qconjugate(q):\n    q = np.asarray(q, float)\n    return np.array([q[0], -q[1], -q[2], -q[3]])\n\n\ndef qnorm(q):\n    return float(np.sqrt(np.dot(q, q)))\n\n\ndef qinverse(q):\n    q = np.asarray(q, float)\n    return qconjugate(q) / np.dot(q, q)\n\n\ndef rotate_vector(v, q):\n    """Rotate vector v by (near-unit) quaternion q (active rotation)."""\n    q = np.asarray(q, float)\n    q = q / np.linalg.norm(q)\n    w, x, y, z = q\n    return Rotation.from_quat([x, y, z, w]).apply(np.asarray(v, float))\n'

EULER_SHIM = '"""Minimal scipy-backed stand-in for transforms3d.euler (default \'sxyz\')."""\n\nimport numpy as np\nfrom scipy.spatial.transform import Rotation\n\n\ndef euler2mat(ai, aj, ak, axes="sxyz"):\n    assert axes == "sxyz"\n    return Rotation.from_euler("xyz", [ai, aj, ak]).as_matrix()\n\n\ndef mat2euler(M, axes="sxyz"):\n    assert axes == "sxyz"\n    return tuple(Rotation.from_matrix(np.asarray(M, float)).as_euler("xyz"))\n'


def setup_scratch():
    shutil.rmtree(SCRATCH, ignore_errors=True)
    (SCRATCH / "common").mkdir(parents=True)
    (SCRATCH / "transforms3d").mkdir()
    for f in ("pose_utils.py", "criterion.py"):
        shutil.copy(REF / f, SCRATCH / "common" / f)
    (SCRATCH / "common" / "__init__.py").touch()
    (SCRATCH / "transforms3d" / "__init__.py").write_text(
        "from . import quaternions, euler  # noqa: F401\n")
    (SCRATCH / "transforms3d" / "quaternions.py").write_text(QUATERNIONS_SHIM)
    (SCRATCH / "transforms3d" / "euler.py").write_text(EULER_SHIM)

    subprocess.run(
        ["2to3", "-w", "-n", "common/pose_utils.py", "common/criterion.py"],
        cwd=SCRATCH, check=True, capture_output=True)

    # py2/numpy-1.x compatibility patches (behavior-preserving):
    pu = SCRATCH / "common" / "pose_utils.py"
    s = pu.read_text()
    # numpy 2 rejects building skew() from (1,)-shaped column-slice elements
    s = s.replace(
        "  s = np.asarray([[0, -x[2], x[1]], [x[2], 0, -x[0]], [-x[1], x[0], 0]])",
        "  x = np.asarray(x).reshape(-1)  # numpy2: accept (3,1) columns\n"
        "  s = np.asarray([[0, -x[2], x[1]], [x[2], 0, -x[0]], [-x[1], x[0], 0]])")
    # np.asscalar was removed in numpy 1.23
    s = s.replace("np.asscalar(np.sqrt(r2/r1))", "float(np.sqrt(r2/r1))")
    pu.write_text(s)

    cr = SCRATCH / "common" / "criterion.py"
    s = cr.read_text()
    # py2 integer division used as a slice index
    s = s.replace("T = s[1] / 2", "T = s[1] // 2")
    cr.write_text(s)


def main():
    setup_scratch()
    sys.path.insert(0, str(SCRATCH))
    capture()


def capture():

    import numpy as np
    import torch

    from common import pose_utils as PU
    from common import criterion as CR
    from transforms3d import euler as txe

    np.set_printoptions(precision=17)
    OUT = {}


    def arr(x):
        return np.asarray(x, np.float64)


    # ---------------------------------------------------------------- inputs
    def det(shape, phase):
        """Deterministic pseudo-values, recorded verbatim in the golden file."""
        n = int(np.prod(shape))
        v = (np.sin(np.arange(n, dtype=np.float64) * 0.7 + phase) * 1.5).reshape(shape)
        return v.astype(np.float32).astype(np.float64)  # f32-exact values


    # 4 raw 3x4 poses: identity, two generic rotations, near-180deg about z
    EULERS = [(0.0, 0.0, 0.0), (0.1, 0.2, 0.3), (-0.4, 0.5, -0.6),
              (0.0, 0.0, np.pi - 1e-3)]
    TS = [[0.0, 0.0, 0.0], [1.0, -2.0, 0.5], [-3.0, 4.0, 2.0], [0.3, 0.1, -0.2]]
    poses_12 = np.stack([
        np.concatenate([txe.euler2mat(*e), np.asarray(t)[:, None]], 1).reshape(-1)
        for e, t in zip(EULERS, TS)
    ])
    ALIGN_R = txe.euler2mat(0.3, -0.2, 0.5)
    ALIGN_T = np.array([1.0, -2.0, 0.5])
    ALIGN_S = 2.5
    MEAN_T = np.array([0.5, -1.0, 2.0])
    STD_T = np.array([2.0, 3.0, 4.0])

    OUT["process_poses_in"] = poses_12
    OUT["process_poses_align_R"] = ALIGN_R
    OUT["process_poses_align_t"] = ALIGN_T
    OUT["process_poses_align_s"] = ALIGN_S
    OUT["process_poses_mean_t"] = MEAN_T
    OUT["process_poses_std_t"] = STD_T
    OUT["process_poses_out"] = PU.process_poses(
        poses_12, MEAN_T, STD_T, ALIGN_R, ALIGN_T, ALIGN_S)

    # identity alignment variant (the 7Scenes default path)
    OUT["process_poses_id_out"] = PU.process_poses(
        poses_12, np.zeros(3), np.ones(3), np.eye(3), np.zeros(3), 1)

    # ------------------------------------------------------------- criteria
    SAX, SAQ, SRX, SRQ = 0.3, -3.0, 0.1, -1.5

    pn_pred, pn_targ = det((4, 6), 0.0), det((4, 6), 1.0)
    OUT["posenet_pred"], OUT["posenet_targ"] = pn_pred, pn_targ
    c = CR.PoseNetCriterion(sax=SAX, saq=SAQ)
    OUT["posenet_loss"] = float(c(torch.from_numpy(np.float32(pn_pred)), torch.from_numpy(np.float32(pn_targ))))

    mn_pred, mn_targ = det((2, 3, 6), 0.25), det((2, 3, 6), 1.25)
    OUT["mapnet_pred"], OUT["mapnet_targ"] = mn_pred, mn_targ
    c = CR.MapNetCriterion(sax=SAX, saq=SAQ, srx=SRX, srq=SRQ)
    OUT["mapnet_loss"] = float(c(torch.from_numpy(np.float32(mn_pred)), torch.from_numpy(np.float32(mn_targ))))

    T = 3
    on_pred = det((2, 2 * T, 6), 0.5)
    on_targ = det((2, 2 * T - 1, 6), 1.5)
    OUT["online_pred"], OUT["online_targ"] = on_pred, on_targ
    c = CR.MapNetOnlineCriterion(sax=SAX, saq=SAQ, srx=SRX, srq=SRQ)
    OUT["online_loss"] = float(c(torch.from_numpy(np.float32(on_pred)), torch.from_numpy(np.float32(on_targ))))

    on_targ_gps = det((2, 2 * T, 6), 2.5)
    OUT["online_gps_targ"] = on_targ_gps
    c = CR.MapNetOnlineCriterion(sax=SAX, saq=SAQ, srx=SRX, srq=SRQ, gps_mode=True)
    OUT["online_gps_loss"] = float(
        c(torch.from_numpy(np.float32(on_pred)), torch.from_numpy(np.float32(on_targ_gps))))

    q1 = det((3, 4), 0.1)
    q1 /= np.linalg.norm(q1, axis=1, keepdims=True)
    q2 = det((3, 4), 0.9)
    q2 /= np.linalg.norm(q2, axis=1, keepdims=True)
    OUT["quatloss_q1"], OUT["quatloss_q2"] = q1, q2
    c = CR.QuaternionLoss()
    OUT["quatloss"] = float(c(torch.from_numpy(np.float32(q1)), torch.from_numpy(np.float32(q2))))

    # ------------------------------------------------------------ VO family
    vo_in = det((2, 3, 6), 0.35)
    OUT["vo_in"] = vo_in
    tin = torch.from_numpy(np.float32(vo_in))
    OUT["calc_vos_simple_out"] = PU.calc_vos_simple(tin).numpy()
    OUT["calc_vos_out"] = PU.calc_vos(tin).numpy()
    OUT["calc_vos_safe_out"] = PU.calc_vos_safe(tin).numpy()

    vo_fc_in = det((1, 4, 6), 0.65)
    OUT["vo_fc_in"] = vo_fc_in
    OUT["calc_vos_safe_fc_out"] = PU.calc_vos_safe_fc(torch.from_numpy(np.float32(vo_fc_in))).numpy()

    # -------------------------------------------------------- q helpers/metrics
    lq = np.array([[0.0, 0.0, 0.0], [0.3, -0.2, 0.1], [1.2, 0.7, -0.4]])
    OUT["qexp_in"] = lq
    OUT["qexp_out"] = np.stack([PU.qexp(v) for v in lq])
    qs = OUT["qexp_out"]
    OUT["qlog_out"] = np.stack([PU.qlog(q) for q in qs])
    OUT["q_ang_err"] = np.array([
        PU.quaternion_angular_error(qs[0], qs[1]),
        PU.quaternion_angular_error(qs[1], qs[2]),
        PU.quaternion_angular_error(qs[2], qs[2]),
    ])

    # ---------------------------------------------------------------- PGO
    pgo_poses, pgo_vos = PU.pgo_test_poses1()
    OUT["pgo_poses"], OUT["pgo_vos"] = pgo_poses, pgo_vos
    OUT["pgo_chain_out"] = PU.PoseGraph().optimize(pgo_poses.copy(), pgo_vos.copy())
    OUT["pgo_chain_w_out"] = PU.PoseGraph().optimize(
        pgo_poses.copy(), pgo_vos.copy(), sax=0.5, saq=0.5, srx=10.0, srq=10.0)

    # FC variant: 3 poses -> pairs (0,1),(0,2),(1,2)
    pt = np.zeros((3, 6))
    pt[:, :3] = pgo_poses[:, :3]
    for i, p in enumerate(pgo_poses):
        pt[i, 3:] = PU.qlog(p[3:])
    vofc = PU.calc_vos_safe_fc(torch.from_numpy(np.float32(pt[None])))[0].numpy()
    vos_fc = np.zeros((len(vofc), 7))
    vos_fc[:, :3] = vofc[:, :3]
    for i, p in enumerate(vofc):
        vos_fc[i, 3:] = PU.qexp(p[3:])
    vos_fc[0, 0] = np.sqrt(2) - 0.5
    OUT["pgo_fc_vos"] = vos_fc
    OUT["pgo_fc_out"] = PU.PoseGraphFC().optimize(pgo_poses.copy(), vos_fc.copy())

    # optimize_poses with VOs derived from target poses
    targ7 = np.zeros((3, 7))
    targ7[:, :3] = np.array([[0.0, 0, 0], [1, 1, 0], [2, 2, 0]])
    for i in range(3):
        targ7[i, 3:] = PU.qexp(np.array([0.0, 0.0, np.deg2rad(22.5) * i]))
    OUT["optp_target"] = targ7
    OUT["optp_out"] = PU.optimize_poses(
        pred_poses=pgo_poses.copy(), target_poses=targ7,
        sax=1, saq=1, srx=20, srq=20)

    # ------------------------------------------------------------- Horn align
    N = 5
    o1 = det((3, N), 3.3)
    Rg = txe.euler2mat(0.4, -0.3, 0.8)
    tg = np.array([[0.5], [-1.0], [2.0]])
    sg = 1.7
    o2 = sg * (Rg @ (o1 - tg))
    R1 = np.stack([txe.euler2mat(0.1 * i, -0.05 * i, 0.2 * i) for i in range(N)])
    R2 = np.stack([Rg @ R1[i] for i in range(N)])
    OUT["align_o1"], OUT["align_o2"] = o1, o2
    OUT["align_R1"], OUT["align_R2"] = R1, R2
    Re, te, se = PU.align_camera_poses(o1.copy(), o2.copy(), R1.copy(), R2.copy(),
                                       use_rotation_constraint=False)
    OUT["align_out_R"], OUT["align_out_t"], OUT["align_out_s"] = Re, arr(te), float(se)
    Rc, tc, sc = PU.align_camera_poses(o1.copy(), o2.copy(), R1.copy(), R2.copy(),
                                       use_rotation_constraint=True)
    OUT["align_rc_R"], OUT["align_rc_t"], OUT["align_rc_s"] = Rc, arr(tc), float(sc)

    # point-set Horn variants (x1 -> x2 maps)
    R3, t3, s3 = PU.align_3d_pts(o1.copy(), o2.copy())
    OUT["align3d_R"], OUT["align3d_t"], OUT["align3d_s"] = R3, arr(t3), float(s3)
    Rn, tn = PU.align_3d_pts_noscale(o1.copy(), o2.copy())[:2]
    OUT["align3dns_R"], OUT["align3dns_t"] = Rn, arr(tn)
    x2d_1 = det((2, N), 4.4)
    th, t2, s2d = 0.7, np.array([[0.3], [-0.8]]), 1.3
    R2d = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    x2d_2 = s2d * (R2d @ (x2d_1 - t2))
    OUT["align2d_x1"], OUT["align2d_x2"] = x2d_1, x2d_2
    R2o, t2o, s2o = PU.align_2d_pts(x2d_1.copy(), x2d_2.copy())
    OUT["align2d_R"], OUT["align2d_t"], OUT["align2d_s"] = R2o, arr(t2o), float(s2o)

    # ------------------------------------------------------------------ emit
    lines = [
        '"""Golden parity values OBSERVED from the reference implementation.',
        "",
        "Produced by executing /root/reference/common/{pose_utils,criterion}.py",
        "(py3-converted scratch copies, scipy-backed transforms3d shim) on the",
        "fixed inputs recorded below. Regenerate with tools/capture_golden.py.",
        "Torch computations ran in float32 (the reference runtime dtype), numpy",
        "in float64. No reference code lives here - only",
        "its observed numerical behavior, pinned so convention drift (sign,",
        "frame, normalization order) fails loudly.",
        '"""',
        "",
        "import numpy as np",
        "",
        "GOLDEN = {",
    ]
    for k, v in OUT.items():
        if isinstance(v, float):
            lines.append(f"    {k!r}: {v!r},")
        else:
            body = np.array2string(
                arr(v), separator=", ", precision=17, threshold=10**6,
                max_line_width=76)
            body = "\n".join("        " + ln.strip() for ln in body.splitlines())
            lines.append(f"    {k!r}: np.array(\n{body}\n    ),")
    lines.append("}")
    open("/root/repo/tests/golden_reference.py", "w").write("\n".join(lines) + "\n")
    print("wrote", len(OUT), "golden entries")


if __name__ == "__main__":
    main()
