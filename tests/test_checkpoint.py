"""Checkpoint round-trips, including REAL reference .pth interop.

The reference's committed distilled checkpoints
(ReCoNet/models_old/SD{1,2}_epoch_4_batchSize_2.pth) are loaded through the
compat layer and verified: key/shape sets match our SD models exactly and
the JAX forward agrees with the functional-torch oracle running the same
weights — the north-star "existing checkpoints work unchanged" requirement.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from vst_tpu.compat import jax_to_torch_arrays
from vst_tpu.models import reconet
from vst_tpu.train import checkpoint as ckpt
from vst_tpu.train.state import create, make_optimizer
from tests import torch_refs as tr

KEY = jax.random.PRNGKey(7)

REF = "/root/reference/Real-time-Coherent-Video-Style-Transfer-Network-(ReCoNet)"
SD1_PTH = f"{REF}/models_old/SD1_epoch_4_batchSize_2.pth"
SD2_PTH = f"{REF}/models_old/SD2_epoch_4_batchSize_2.pth"


class TestRoundTrips:
    def test_params_npz(self, tmp_path):
        params = reconet.init_reconet_sd2(KEY)
        path = str(tmp_path / "p.npz")
        ckpt.save_params(params, path)
        loaded = ckpt.load_params(path)
        assert set(loaded) == set(params)
        for k in params:
            np.testing.assert_array_equal(np.asarray(loaded[k]),
                                          np.asarray(params[k]))

    def test_full_state_default_orbax(self, tmp_path):
        """save_state's default writes an orbax checkpoint directory."""
        opt = make_optimizer(1e-3)
        state = create(reconet.init_reconet_sd2(KEY), opt)
        path = str(tmp_path / "last_state")
        ckpt.save_state(state, path)
        assert os.path.isdir(path)
        like = create(reconet.init_reconet_sd2(jax.random.PRNGKey(3)), opt)
        loaded = ckpt.load_state(path, like=like)
        assert int(loaded.step) == int(state.step)
        for k in state.params:
            np.testing.assert_array_equal(np.asarray(loaded.params[k]),
                                          np.asarray(state.params[k]))
        # periodic mid-epoch saves overwrite the same path in place
        ckpt.save_state(loaded._replace(step=loaded.step + 1), path)
        again = ckpt.load_state(path, like=like)
        assert int(again.step) == int(state.step) + 1

    def test_crash_mid_swap_prefers_completed_new(self, tmp_path):
        """A kill between writing <path>.new and swapping it in must not
        lose progress: load_state prefers the completed .new directory, and
        the old checkpoint is never deleted before the new one exists."""
        import shutil

        opt = make_optimizer(1e-3)
        state = create(reconet.init_reconet_sd2(KEY), opt)
        like = create(reconet.init_reconet_sd2(jax.random.PRNGKey(3)), opt)
        path = str(tmp_path / "last_state")
        ckpt.save_state(state, path)
        # simulate the crash window: a newer completed save sitting at .new
        newer = state._replace(step=state.step + 7)
        ckpt.save_state(newer, str(tmp_path / "staging"))
        shutil.move(str(tmp_path / "staging"), path + ".new")
        loaded = ckpt.load_state(path, like=like)
        assert int(loaded.step) == int(state.step) + 7
        # the next save supersedes the leftover .new and swaps cleanly
        ckpt.save_state(newer._replace(step=newer.step + 1), path)
        assert not os.path.isdir(path + ".new")
        again = ckpt.load_state(path, like=like)
        assert int(again.step) == int(state.step) + 8


    def test_leftover_new_is_promoted_not_deleted(self, tmp_path,
                                                  monkeypatch):
        """A leftover <path>.new is a COMPLETE checkpoint and may be the
        newest (or only) resumable state: the next save must promote it
        before writing, so a second crash mid-write can never leave zero
        (or stale-only) checkpoints behind."""
        import shutil

        opt = make_optimizer(1e-3)
        state = create(reconet.init_reconet_sd2(KEY), opt)
        like = create(reconet.init_reconet_sd2(jax.random.PRNGKey(3)), opt)
        path = str(tmp_path / "last_state")
        ckpt.save_state(state, path)
        newer = state._replace(step=state.step + 7)
        ckpt.save_state(newer, str(tmp_path / "staging"))
        shutil.move(str(tmp_path / "staging"), path + ".new")

        # crash DURING the next save's write phase
        import orbax.checkpoint as ocp

        class Boom(RuntimeError):
            pass

        def dying_save(self, *a, **k):
            raise Boom()

        monkeypatch.setattr(ocp.StandardCheckpointer, "save", dying_save)
        import pytest as _pytest
        with _pytest.raises(Boom):
            ckpt.save_state(newer._replace(step=newer.step + 1), path)
        # the promoted .new survived as <path>: nothing was lost
        loaded = ckpt.load_state(path, like=like)
        assert int(loaded.step) == int(state.step) + 7

    def test_leftover_new_without_path_is_promoted(self, tmp_path,
                                                   monkeypatch):
        """First-ever save crashed between write and swap (only .new
        exists): the next save must not rmtree the only checkpoint."""
        import shutil

        opt = make_optimizer(1e-3)
        state = create(reconet.init_reconet_sd2(KEY), opt)
        like = create(reconet.init_reconet_sd2(jax.random.PRNGKey(3)), opt)
        path = str(tmp_path / "last_state")
        ckpt.save_state(state, str(tmp_path / "staging"))
        shutil.move(str(tmp_path / "staging"), path + ".new")

        import orbax.checkpoint as ocp

        class Boom(RuntimeError):
            pass

        monkeypatch.setattr(ocp.StandardCheckpointer, "save",
                            lambda self, *a, **k: (_ for _ in ()).throw(Boom()))
        import pytest as _pytest
        with _pytest.raises(Boom):
            ckpt.save_state(state._replace(step=state.step + 1), path)
        loaded = ckpt.load_state(path, like=like)
        assert int(loaded.step) == int(state.step)


    def test_full_state_pickle(self, tmp_path):
        opt = make_optimizer(1e-3)
        state = create(reconet.init_reconet_sd2(KEY), opt)
        path = str(tmp_path / "state.pkl")
        ckpt.save_state(state, path, format="pickle")
        loaded = ckpt.load_state(path)
        assert int(loaded.step) == int(state.step)
        for k in state.params:
            np.testing.assert_array_equal(np.asarray(loaded.params[k]),
                                          np.asarray(state.params[k]))

    def test_legacy_unversioned_pickle_still_loads(self, tmp_path):
        """Rounds ≤3 pickled the raw pytree with no version wrapper."""
        import pickle

        opt = make_optimizer(1e-3)
        state = create(reconet.init_reconet_sd2(KEY), opt)
        path = str(tmp_path / "old.pkl")
        with open(path, "wb") as f:
            pickle.dump(jax.tree.map(np.asarray, state), f)
        loaded = ckpt.load_state(path)
        for k in state.params:
            np.testing.assert_array_equal(np.asarray(loaded.params[k]),
                                          np.asarray(state.params[k]))

    def test_future_version_rejected(self, tmp_path):
        import pickle

        path = str(tmp_path / "future.pkl")
        with open(path, "wb") as f:
            pickle.dump({"__vst_state_version__": ckpt.STATE_VERSION + 1,
                         "tree": {}}, f)
        with pytest.raises(ValueError, match="state version"):
            ckpt.load_state(path)

    def test_pickle_save_replaces_stale_orbax_dir(self, tmp_path):
        """ADVICE r4: a run that previously saved orbax directories and is
        resumed where orbax is unavailable must not crash at its first
        pickle save — the stale DIRECTORY at the state path is replaced."""
        opt = make_optimizer(1e-3)
        state = create(reconet.init_reconet_sd2(KEY), opt)
        path = str(tmp_path / "last_state")
        ckpt.save_state(state, path)  # orbax directory
        assert os.path.isdir(path)
        newer = state._replace(step=state.step + 5)
        ckpt.save_state(newer, path, format="pickle")
        assert os.path.isfile(path)
        loaded = ckpt.load_state(path)
        assert int(loaded.step) == int(state.step) + 5

    def test_newer_pickle_beats_stale_new_dir(self, tmp_path):
        """ADVICE r4: a crash-mid-swap ``.new`` directory must not shadow a
        NEWER pickle-fallback file later written at the state path."""
        opt = make_optimizer(1e-3)
        state = create(reconet.init_reconet_sd2(KEY), opt)
        path = str(tmp_path / "last_state")
        # simulate the crash-mid-swap leftover: a complete orbax ckpt at .new
        ckpt.save_state_orbax(state, path + ".new")
        # ...then the run continued with the pickle fallback, 7 steps later
        ckpt.save_state(state._replace(step=state.step + 7), path,
                        format="pickle")
        os.utime(path, (2_000_000_000, 2_000_000_000))  # decisively newer
        like = create(reconet.init_reconet_sd2(jax.random.PRNGKey(4)), opt)
        loaded = ckpt.load_state(path, like=like)
        assert int(loaded.step) == int(state.step) + 7
        # and the converse still prefers a NEWER .new (the original case)
        ckpt.save_state_orbax(state._replace(step=state.step + 9),
                              path + ".new")
        for sub in ("", "/_CHECKPOINT_METADATA"):
            if os.path.exists(path + ".new" + sub):
                os.utime(path + ".new" + sub,
                         (2_100_000_000, 2_100_000_000))
        loaded = ckpt.load_state(path, like=like)
        assert int(loaded.step) == int(state.step) + 9

    def test_pth_round_trip(self, tmp_path):
        params = reconet.init_reconet(KEY)
        path = str(tmp_path / "m.pth")
        ckpt.export_pth(params, path)
        back = ckpt.import_pth(path, strict_keys=set(params))
        for k in params:
            np.testing.assert_allclose(np.asarray(back[k]),
                                       np.asarray(params[k]), rtol=0, atol=0)

    def test_partial_init(self):
        student = reconet.init_reconet_sd1(KEY)
        donor = reconet.init_reconet(jax.random.PRNGKey(9))
        merged = ckpt.partial_init_from(student, donor)
        # conv2/deconv2 shapes differ between ReCoNet and SD1 → untouched;
        # deconv3 (ConvTanh head) differs in input channels (48 vs 32).
        assert set(merged) == set(student)


@pytest.mark.skipif(not os.path.exists(SD1_PTH),
                    reason="reference checkpoints unavailable")
class TestReferenceCheckpoints:
    @pytest.mark.parametrize(
        "path,init,apply,t_apply",
        [
            (SD1_PTH, reconet.init_reconet_sd1, reconet.reconet_sd1,
             tr.t_reconet_sd1),
            (SD2_PTH, reconet.init_reconet_sd2, reconet.reconet_sd2,
             tr.t_reconet_sd2),
        ],
    )
    def test_load_and_forward(self, rng, path, init, apply, t_apply):
        expected = init(KEY)
        params = ckpt.import_pth(path, strict_keys=set(expected))
        for k in expected:
            assert tuple(params[k].shape) == tuple(expected[k].shape), k

        x = (rng.random((1, 48, 64, 3)) * 255).astype(np.float32)
        ours = apply(params, jnp.asarray(x))[-1]
        t_state = {k: torch.from_numpy(np.ascontiguousarray(v))
                   for k, v in jax_to_torch_arrays(params).items()}
        ref = t_apply(t_state, torch.from_numpy(
            np.ascontiguousarray(x.transpose(0, 3, 1, 2))))[-1]
        np.testing.assert_allclose(
            np.asarray(ours), ref.detach().numpy().transpose(0, 2, 3, 1),
            rtol=2e-3, atol=2e-2)


class TestOrbax:
    def test_round3_bare_layout_still_loads(self, tmp_path):
        """Round-3 orbax checkpoints saved the bare TrainState tree with no
        version wrapper; the loader sniffs the layout and restores both."""
        import orbax.checkpoint as ocp

        opt = make_optimizer(1e-3)
        state = create(reconet.init_reconet_sd2(KEY), opt)
        path = str(tmp_path / "bare")
        with ocp.StandardCheckpointer() as c:
            c.save(path, jax.tree.map(np.asarray, state))
        like = create(reconet.init_reconet_sd2(jax.random.PRNGKey(4)), opt)
        restored = ckpt.load_state(path, like=like)
        for k in state.params:
            np.testing.assert_array_equal(np.asarray(restored.params[k]),
                                          np.asarray(state.params[k]))

    def test_wrong_sniff_recovers_via_retry(self, tmp_path, monkeypatch):
        """ADVICE r4: the versioned-layout sniff reads orbax's PRIVATE
        _METADATA format; if that layout ever changes, the sniff may guess
        wrong — the loader must retry with the other template instead of
        failing hard.  Force the sniff to lie both ways."""
        import orbax.checkpoint as ocp

        opt = make_optimizer(1e-3)
        state = create(reconet.init_reconet_sd2(KEY), opt)
        like = create(reconet.init_reconet_sd2(jax.random.PRNGKey(4)), opt)

        bare = str(tmp_path / "bare")
        with ocp.StandardCheckpointer() as c:
            c.save(bare, jax.tree.map(np.asarray, state))
        monkeypatch.setattr(ckpt, "_sniff_versioned", lambda p: True)
        restored = ckpt.load_state(bare, like=like)
        assert int(restored.step) == int(state.step)

        wrapped = str(tmp_path / "wrapped")
        ckpt.save_state_orbax(state, wrapped)
        monkeypatch.setattr(ckpt, "_sniff_versioned", lambda p: False)
        restored = ckpt.load_state(wrapped, like=like)
        assert int(restored.step) == int(state.step)

    def test_round_trip(self, tmp_path):
        from vst_tpu.train.checkpoint import load_state_orbax, save_state_orbax

        opt = make_optimizer(1e-3)
        state = create(reconet.init_reconet_sd2(KEY), opt)
        path = str(tmp_path / "orbax_ckpt")
        save_state_orbax(state, path)
        like = create(reconet.init_reconet_sd2(jax.random.PRNGKey(1)), opt)
        restored = load_state_orbax(path, like)
        for k in state.params:
            np.testing.assert_array_equal(np.asarray(restored.params[k]),
                                          np.asarray(state.params[k]))
        assert int(restored.step) == int(state.step)
