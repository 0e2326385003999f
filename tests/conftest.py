"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

The reference has no tests at all (SURVEY.md §4); our pyramid runs every
multi-device path on a virtual CPU mesh so sharding logic is exercised
without TPU hardware.
"""

import os
import sys

_platform = os.environ.get("COSA_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The sandbox's sitecustomize.py force-registers a TPU backend via
# jax.config.update("jax_platforms", ...) at interpreter start, which wins
# over the env var — update the live config back.
import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)


# ---------------------------------------------------------------------------
# Quick tier: `pytest -m quick` runs one representative test per subsystem
# (~3 min) so drivers/CI can gate fast before the full ~35-min suite.
# Entries are "<file basename>::<test function name>" (parametrized tests
# match every param case of that function).
# ---------------------------------------------------------------------------

import pytest  # noqa: E402

QUICK_TIER = {
    # config / CLI
    "test_config.py::test_cli_dataset_dispatch_and_overrides",
    # data layer
    "test_data.py::test_sample_replayable",
    "test_data.py::test_loader_shards_partition_data",
    "test_voc_files.py::test_voc_train_dataset_from_files",
    "test_synthwsss.py::test_deterministic_and_valid",
    # ops
    "test_resize.py::test_bilinear_matches_torch",
    "test_permutohedral.py::test_matches_reference_cpp_energy_kernel",
    "test_par_gmm.py::test_gmm_thresholds_close_to_sklearn",
    "test_native.py::test_cpp_lattice_matches_jax_lattice",
    # objectives
    "test_losses.py::test_seg_loss_matches_torch",
    "test_pseudo.py::test_cam2mask_matches_reference_per_image_algorithm",
    "test_energy.py::test_get_energy_loss_pipeline",
    "test_variants.py::test_multi_scale_v2_max_sum_matches_live_fuse",
    "test_rrm.py::test_compute_joint_loss_ce_matches_torch",
    # models
    "test_model.py::test_output_shapes",
    "test_convert_parity.py::test_augreg_npz_loader",
    "test_zoo_oracle.py::test_window_attention_matches_torch",
    "test_zoo.py::test_zoo_factory_dispatch",
    # train
    "test_optimizer.py::test_schedule_matches_reference_trajectory",
    "test_train_step.py::test_train_step_dp8",
    # eval
    "test_eval.py::test_scores_match_reference_formula",
    "test_eval.py::test_evaluate_synthetic_end_to_end",
    "test_crf.py::test_native_and_jax_crf_agree",
    # utils
    "test_logging.py::test_metric_writer_jsonl",
    "test_visualize.py::test_save_seg_roundtrip",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.fspath.basename
        func = getattr(item, "originalname", None) or item.name.split("[")[0]
        if f"{base}::{func}" in QUICK_TIER:
            item.add_marker(pytest.mark.quick)
