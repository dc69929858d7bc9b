"""minigin parser + the full config zoo."""

import pathlib

import flax.linen as nn
import pytest

from nerfies_tpu import configs
from nerfies_tpu import minigin as gin
from nerfies_tpu import schedules

REPO_ROOT = pathlib.Path(__file__).parent.parent
ZOO = REPO_ROOT / 'configs'


@pytest.fixture(autouse=True)
def _clean_gin():
  gin.clear_config()
  gin.add_search_path(REPO_ROOT)
  gin.add_search_path(ZOO)
  yield
  gin.clear_config()


def test_parse_simple_bindings():
  gin.parse_config('ModelConfig.num_coarse_samples = 32\n'
                   'ModelConfig.use_warp = True\n')
  cfg = configs.ModelConfig()
  assert cfg.num_coarse_samples == 32
  assert cfg.use_warp is True
  # Unbound fields keep their defaults.
  assert cfg.num_fine_samples == 128


def test_macros_and_references():
  gin.parse_config(
      'my_steps = 500\n'
      'SCHED = {"type": "linear", "initial_value": 0.0,\n'
      '         "final_value": 8.0, "num_steps": %my_steps}\n'
      'TrainConfig.batch_size = 8\n'
      'TrainConfig.warp_alpha_schedule = %SCHED\n')
  cfg = configs.TrainConfig()
  assert cfg.warp_alpha_schedule['num_steps'] == 500
  sched = schedules.from_config(cfg.warp_alpha_schedule)
  assert sched(500) == 8.0


def test_function_references():
  gin.parse_config('ModelConfig.sigma_activation = @nn.softplus')
  cfg = configs.ModelConfig()
  assert cfg.sigma_activation is nn.softplus


def test_comments_and_strings():
  gin.parse_config("# full-line comment\n"
                   "ModelConfig.warp_field_type = 'se3'  # trailing\n")
  assert configs.ModelConfig().warp_field_type == 'se3'


def test_multiline_nested_value():
  gin.parse_config(
      "TrainConfig.batch_size = 4\n"
      "TrainConfig.elastic_loss_weight_schedule = {\n"
      "  'type': 'piecewise',\n"
      "  'schedules': [\n"
      "    (50000, ('constant', 0.01)),\n"
      "    (100000, ('cosine_easing', 0.01, 1e-8, 100000)),\n"
      "  ]\n"
      "}\n")
  cfg = configs.TrainConfig()
  sched = schedules.from_config(cfg.elastic_loss_weight_schedule)
  assert sched(0) == 0.01


def test_required_binding_enforced():
  with pytest.raises(ValueError, match='REQUIRED'):
    configs.TrainConfig()


def test_skip_unknown_bindings():
  gin.parse_config('ModelConfig.nonexistent_field_xyz = 3\n'
                   'SomeUnknownClass.field = 5\n')
  configs.ModelConfig()  # must not raise


def test_explicit_kwargs_override_bindings():
  gin.parse_config('ModelConfig.num_coarse_samples = 32')
  assert configs.ModelConfig(num_coarse_samples=7).num_coarse_samples == 7


def test_undefined_macro_raises():
  gin.parse_config('ModelConfig.num_coarse_samples = %nope')
  with pytest.raises(gin.ParseError, match='Undefined macro'):
    configs.ModelConfig()


@pytest.mark.parametrize('name', [
    'test_local', 'test_vrig', 'gpu_quarterhd', 'gpu_quarterhd_4gpu',
    'gpu_fullhd', 'gpu_vrig_paper'])
def test_config_zoo_parses(name):
  gin.parse_config_files_and_bindings(config_files=[ZOO / f'{name}.gin'])
  exp = configs.ExperimentConfig()
  model = configs.ModelConfig()
  train = configs.TrainConfig()
  ev = configs.EvalConfig()
  # Every zoo config must produce working schedules.
  for sched_def in (train.lr_schedule, train.warp_alpha_schedule,
                    train.time_alpha_schedule,
                    train.elastic_loss_weight_schedule):
    s = schedules.from_config(sched_def)
    assert isinstance(s(0), float)
  assert isinstance(train.batch_size, int)
  assert exp.image_scale in (1, 4, 8)
  assert model.num_coarse_samples > 0
  assert ev.chunk > 0


def test_quarterhd_values():
  gin.parse_config_files_and_bindings(
      config_files=[ZOO / 'gpu_quarterhd.gin'])
  train = configs.TrainConfig()
  model = configs.ModelConfig()
  assert train.batch_size == 6144
  assert train.max_steps == 250000
  assert model.num_coarse_samples == 128
  assert model.num_fine_samples == 128
  assert model.use_warp is True  # via warp_defaults
  assert train.use_elastic_loss is True
  lr = schedules.from_config(train.lr_schedule)
  assert abs(lr(0) - 0.001) < 1e-9
  assert abs(lr(250000) - 0.0001) < 1e-9


def test_vrig_paper_values():
  gin.parse_config_files_and_bindings(
      config_files=[ZOO / 'gpu_vrig_paper.gin'])
  model = configs.ModelConfig()
  train = configs.TrainConfig()
  assert model.use_camera_metadata is True
  assert model.use_appearance_metadata is False
  assert model.warp_field_type == 'se3'
  assert model.num_warp_freqs == 6
  assert train.elastic_reduce_method == 'weight'
  warp_sched = schedules.from_config(train.warp_alpha_schedule)
  assert warp_sched(0) == 0.0
  assert warp_sched(80000) == 6.0  # %num_warp_freqs override


def test_gin_bindings_override_files():
  gin.parse_config_files_and_bindings(
      config_files=[ZOO / 'test_local.gin'],
      bindings=['TrainConfig.batch_size = 16',
                'ModelConfig.num_coarse_samples = 4'])
  assert configs.TrainConfig().batch_size == 16
  assert configs.ModelConfig().num_coarse_samples == 4


def test_operative_config_roundtrip():
  gin.parse_config_files_and_bindings(config_files=[ZOO / 'test_local.gin'])
  text = gin.operative_config_str()
  before = configs.ModelConfig()
  gin.clear_config()
  gin.parse_config(text)
  after = configs.ModelConfig()
  assert before == after


def test_tpu_config_preset():
  gin.parse_config_files_and_bindings(
      config_files=[ZOO / 'tpu_quarterhd.gin'])
  model = configs.ModelConfig()
  assert model.use_bfloat16 is True
  assert model.use_remat is True
  train = configs.TrainConfig()
  assert train.batch_size == 6144  # inherits gpu_quarterhd
