"""Two-process jax.distributed smoke test of the --multihost training entry
(reference mapping: SURVEY §5.8 — the reference used torch DataParallel on
one host; the TPU-native equivalent is one process per host over a global
mesh). Runs the REAL tools/train_net_step.py CLI in two coordinated
subprocesses on the CPU backend (2 virtual devices each -> 4 global),
asserting: distributed init sees 2 processes, per-host loader streams get
disjoint seeds, training steps produce finite losses on both ranks, and
only the chief writes checkpoints."""

import json
import os
import re
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def mh_env(tmp_path_factory):
    import cv2

    from tests.test_tools_cli import TINY_YAML

    tmp_path = tmp_path_factory.mktemp("mh")
    img_dir = tmp_path / "coco" / "val2017"
    ann_dir = tmp_path / "coco" / "annotations"
    img_dir.mkdir(parents=True)
    ann_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(4):
        h, w = 96, 128
        cv2.imwrite(str(img_dir / "{:012d}.jpg".format(i + 1)),
                    rng.randint(0, 255, (h, w, 3), np.uint8))
        images.append({"id": i + 1, "width": w, "height": h,
                       "file_name": "{:012d}.jpg".format(i + 1)})
        annotations.append({
            "id": i + 1, "image_id": i + 1, "category_id": 1,
            "bbox": [10.0, 10.0, 40.0, 30.0], "area": 1200.0, "iscrowd": 0,
            "segmentation": [[10, 10, 50, 10, 50, 40, 10, 40]],
        })
    gt = {"images": images, "annotations": annotations,
          "categories": [{"id": k, "name": n, "supercategory": "x"}
                         for k, n in ((1, "a"), (2, "b"), (3, "c"))]}
    (ann_dir / "instances_val2017.json").write_text(json.dumps(gt))
    cfg_file = tmp_path / "tiny.yaml"
    # OUTPUT_DIR is per-rank (appended via --set) so chief-only checkpoint
    # writes are observable; the yaml value is a placeholder.
    cfg_file.write_text(TINY_YAML.format(
        out=str(tmp_path / "unused"), data=str(tmp_path)))
    return {"tmp": tmp_path, "cfg": str(cfg_file)}


def test_two_process_multihost_train(mh_env):
    port = 21000 + os.getpid() % 2000
    procs, logs = [], []
    for rank in range(2):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["DETECTRON_TPU_CPU_DEVICES"] = "2"
        # Gloo (the CPU cross-process collective transport) must pair over
        # loopback here; interface auto-detection picks an unroutable addr.
        env["GLOO_SOCKET_IFNAME"] = "lo"
        # No SHARED compile cache: concurrent writers can abort natively
        # (observed as rank crashes when both ranks compile cold). Popping
        # the env var is not enough — tools/_init_paths.py defaults to
        # /tmp/jax_cache — so give each rank its own dir.
        env["JAX_COMPILATION_CACHE_DIR"] = str(
            mh_env["tmp"] / ("jax_cache_rank%d" % rank))
        out_dir = mh_env["tmp"] / ("out_rank%d" % rank)
        log = open(str(mh_env["tmp"] / ("rank%d.log" % rank)), "w")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, "train_net_step.py",
             "--cfg", mh_env["cfg"], "--bs", "4", "--nw", "1",
             "--multihost_coordinator", "localhost:%d" % port,
             "--num_hosts", "2", "--host_rank", str(rank),
             # The 4-image noise dataset diverges at the linearly-scaled
             # lr (0.004); pin a stable one — finiteness is the assertion.
             "--lr", "0.0002",
             "--disp_interval", "1",
             # Linear scaling divides MAX_ITER by bs/original(=4): ask for
             # 12 so 3 steps actually run.
             "--set", "OUTPUT_DIR", str(out_dir),
             "SOLVER.MAX_ITER", "12", "SOLVER.STEPS", "[0]"],
            cwd=os.path.join(REPO, "tools"), env=env,
            stdout=log, stderr=subprocess.STDOUT))
    for p in procs:
        p.wait(timeout=1200)
    for log in logs:
        log.close()
    texts = [open(str(mh_env["tmp"] / ("rank%d.log" % r))).read()
             for r in range(2)]
    for r, (p, t) in enumerate(zip(procs, texts)):
        assert p.returncode == 0, "rank %d:\n%s" % (r, t[-3000:])

    # Both processes joined one 2-process / 4-device world.
    assert re.search(r"multi-host: process 0/2, 2 local / 4 global", texts[0])
    assert re.search(r"multi-host: process 1/2, 2 local / 4 global", texts[1])

    # Disjoint per-host loader streams (seed = RNG_SEED + rank).
    s0 = re.search(r"loader stream seed (\d+) \(host 0/2", texts[0])
    s1 = re.search(r"loader stream seed (\d+) \(host 1/2", texts[1])
    assert s0 and s1 and s0.group(1) != s1.group(1)

    # Finite losses on both ranks (stats are global means, so both ranks
    # log the same values).
    for t in texts:
        m = [json.loads(x) for x in re.findall(r"json_stats: (\{.*\})", t)]
        assert m and all(np.isfinite(e["loss"]) for e in m)

    # Chief-only checkpointing: rank 0's output tree has a ckpt dir, rank
    # 1's does not.
    ck0 = list((mh_env["tmp"] / "out_rank0").rglob("model_step*"))
    ck1 = list((mh_env["tmp"] / "out_rank1").rglob("model_step*"))
    assert ck0, "chief wrote no checkpoint"
    assert not ck1, "non-chief wrote checkpoints: %s" % ck1
