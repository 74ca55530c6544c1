"""CLI flag parity with the reference's argparse surfaces (SURVEY.md §2.1
items 8/9/11: run_single_image.py:19-43, run_batch.py:45-89,
evaluate.py:26-42).  A reference user's command lines must keep working."""

import importlib
import sys


def _flags(parser):
    out = set()
    for action in parser._actions:
        out.update(o for o in action.option_strings if o.startswith("--"))
    return out

def _parser(module_name):
    sys.path.insert(0, ".")
    mod = importlib.import_module(module_name)
    return mod.build_parser()


REFERENCE_SINGLE = {
    "--image", "--prompt", "--model", "--negative_prompt", "--steps",
    "--guidance", "--control_scale", "--canny_low", "--canny_high", "--seed",
    "--output_dir", "--no_cpu_offload", "--quality_mode", "--full_precision",
    "--full_controlnet", "--compute_metrics", "--show_plot",
}

REFERENCE_BATCH = {
    "--mapping_file", "--source_dir", "--output_dir", "--model",
    "--num_images", "--editing_types", "--image_ids", "--steps", "--guidance",
    "--control_scale", "--canny_low", "--canny_high", "--seed",
    "--negative_prompt", "--no_cpu_offload", "--quality_mode",
    "--full_precision", "--full_controlnet", "--skip_existing",
    "--save_comparisons",
}

REFERENCE_EVALUATE = {
    "--mapping_file", "--source_dir", "--outputs_dir", "--results_file",
    "--summary_file", "--device",
}


def test_run_single_image_flags():
    assert REFERENCE_SINGLE <= _flags(_parser("run_single_image"))


def test_run_batch_flags():
    assert REFERENCE_BATCH <= _flags(_parser("run_batch"))


def test_evaluate_flags():
    assert REFERENCE_EVALUATE <= _flags(_parser("evaluate"))


def test_model_choices_include_reference_models():
    parser = _parser("run_batch")
    for action in parser._actions:
        if "--model" in action.option_strings:
            assert {"sdxl", "ssd-1b"} <= set(action.choices)
