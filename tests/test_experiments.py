"""Tests for the shared experiment-config surface (pda/experiments/common.py)
and the reference-mirroring CLI contracts.

The reference hard-codes this surface per script; the contracts under test are
the cross-phase interfaces: flag names (reference livecell_mt.py:199-222,
mitoem_adamt.py:161-189), checkpoint naming (livecell_mt.py:87-92), and the
Lung prepare_data invocation forms (Lung-XRay/prepare_data.py:108-135).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # fit()-heavy suite; default run skips, use --runslow

from pda.experiments import da_name, standard_parser, weak_augmentations
from pda.experiments.common import mesh_from_arg

REPO = os.path.join(os.path.dirname(__file__), "..")


class TestStandardParser:
    def test_reference_flags_present(self):
        p = standard_parser("d", extra_flags=("consensus", "pseudo", "type"))
        args = p.parse_args(
            ["--train", "--predict", "--evaluate", "--consensus", "--masking",
             "--get_pseudo_labels", "--type", "vnc", "--data", "d/",
             "--pred_path", "p/", "--source_checkpoints", "c/",
             "--save_root", "s/"]
        )
        assert args.train and args.predict and args.evaluate
        assert args.consensus and args.masking and args.get_pseudo_labels
        assert args.type == "vnc"

    def test_type_flag_gated(self):
        p = standard_parser("d")
        with pytest.raises(SystemExit):
            p.parse_args(["--type", "vnc"])

    def test_type_restricts_mitoem_training_targets(self, monkeypatch):
        """--type restricts the joint-training loop to one EM target
        (reference mitoem_adamt.py:147,185-188)."""
        from pda.experiments import mitoem_da

        seen = []

        def fake_print(msg, *a, **k):
            seen.append(str(msg))

        p = standard_parser("d", extra_flags=("consensus", "type"))
        args = p.parse_args(["--type", "lucchi"])
        monkeypatch.setattr("builtins.print", fake_print)

        class Boom(Exception):
            pass

        # abort inside the first loop iteration, after the target is chosen
        monkeypatch.setattr(mitoem_da, "da_name",
                            lambda *a, **k: (_ for _ in ()).throw(Boom()))
        with pytest.raises(Boom):
            mitoem_da.train(args, "adamt", None)
        assert any("lucchi" in m for m in seen)
        assert not any("vnc" in m for m in seen)


class TestNaming:
    def test_da_name_matches_reference_contract(self):
        assert (
            da_name("mean-teacher", "livecell", "A172", "BT474", True, False)
            == "mean-teacher-livecell-source-A172-target-BT474-consensus-weighting"
        )
        assert (
            da_name("adamt", "mito", "mitoem", "vnc", False, True)
            == "adamt-mito-source-mitoem-target-vnc-consensus-masking"
        )
        # masking takes precedence (the reference's naming bug is NOT copied)
        assert da_name("m", "s", "a", "b", True, True).endswith("consensus-masking")
        assert da_name("m", "s", "a", "b", False, False) == "m-s-source-a-target-b"


class TestMeshArg:
    def test_specs(self):
        class A:
            mesh = None

        assert mesh_from_arg(A()) is None
        A.mesh = "data=2"
        assert tuple(mesh_from_arg(A()).shape.values()) == (2,)
        A.mesh = "data=2,space=2"
        assert tuple(mesh_from_arg(A()).shape.values()) == (2, 2)
        for bad in ("data=0", "data=x", "bogus=2", "data=2,data=2"):
            A.mesh = bad
            with pytest.raises(ValueError):
                mesh_from_arg(A())


class TestWeakAugs:
    def test_weak_augmentation_standardizes(self):
        aug = weak_augmentations(p=0.0)  # no random ops -> deterministic
        rng = np.random.default_rng(0)
        x = rng.normal(3.0, 5.0, size=(64, 64)).astype(np.float32)
        out = np.asarray(aug(x, rng), dtype=np.float32)
        assert abs(float(out.mean())) < 1e-3
        assert abs(float(out.std()) - 1.0) < 1e-2


class TestLungPrepareCLI:
    def test_reference_invocation_form(self, tmp_path):
        """`prepare_data.py INPUT --data OUT` copies the jsrt trees
        (reference Lung-XRay/prepare_data.py:108-135)."""
        src = tmp_path / "in"
        (src / "jsrt" / "Segmentation01").mkdir(parents=True)
        (src / "jsrt" / "segmentation02" / "segmentation").mkdir(parents=True)
        (src / "jsrt" / "Segmentation01" / "a.png").write_bytes(b"x")
        (src / "jsrt" / "segmentation02" / "segmentation" / "b.png").write_bytes(b"y")
        out = tmp_path / "out"
        script = os.path.join(REPO, "experiments", "Lung-XRay", "prepare_data.py")
        r = subprocess.run(
            [sys.executable, script, str(src), "--data", str(out)],
            capture_output=True, text=True, timeout=300,
        )
        assert r.returncode == 0, r.stderr
        assert (out / "jsrt1" / "a.png").exists()
        assert (out / "jsrt2" / "b.png").exists()
