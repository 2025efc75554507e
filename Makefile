# SALSA-TPU launcher — same task surface as the reference Makefile.

FEATURE_CONFIG=./configs/tnsse2021_classic.yml
FEATURE_TYPE=linspeciv
SALSA_CONFIG=./configs/tnsse2021_salsa.yml
SALSA_LITE_CONFIG=./configs/tnsse2021_salsa_lite.yml
SALSA_LITE_FEATURE_TYPE=salsa_lite

CONFIG=./configs/seld.yml
OUTPUT=./outputs
EXP_SUFFIX=_run1
RESUME=

OUTPUT_DIR=./outputs/crossval/foa/salsa/seld$(EXP_SUFFIX)/outputs/submissions/test
GT_ROOT_DIR=/data/dcase2021/task3

.PHONY: feature salsa salsa-lite train inference evaluate test bench

feature:
	python -m salsa_tpu.cli.extract --data-config $(FEATURE_CONFIG) --feature-type $(FEATURE_TYPE)

salsa:
	python -m salsa_tpu.cli.extract --data-config $(SALSA_CONFIG) --feature-type salsa

salsa-lite:
	python -m salsa_tpu.cli.extract --data-config $(SALSA_LITE_CONFIG) --feature-type $(SALSA_LITE_FEATURE_TYPE)

train:
	python -m salsa_tpu.cli.train --exp-config $(CONFIG) --exp-group-dir $(OUTPUT) --exp-suffix $(EXP_SUFFIX) $(RESUME)

inference:
	python -m salsa_tpu.cli.infer --exp-config $(CONFIG) --exp-group-dir $(OUTPUT) --exp-suffix $(EXP_SUFFIX)

WAV_DIR=/data/dcase2021/task3/foa_eval
PRED_DIR=./outputs/direct_predictions

.PHONY: import-ckpt
TORCH_CKPT=/path/to/reference.ckpt
import-ckpt:
	python -m salsa_tpu.cli.import_ckpt --exp-config $(CONFIG) --exp-group-dir $(OUTPUT) --exp-suffix $(EXP_SUFFIX) --torch-ckpt $(TORCH_CKPT)

.PHONY: export-ckpt
EXPORT_CKPT=./exported.ckpt
export-ckpt:
	python -m salsa_tpu.cli.export_ckpt --exp-config $(CONFIG) --exp-group-dir $(OUTPUT) --exp-suffix $(EXP_SUFFIX) --out $(EXPORT_CKPT)

.PHONY: ensemble
PRED_DIRS=
ENSEMBLE_OUT=./outputs/ensemble_submissions
ensemble:
	python -m salsa_tpu.cli.ensemble --pred-dirs $(PRED_DIRS) --out-dir $(ENSEMBLE_OUT)

.PHONY: predict
predict:
	python -m salsa_tpu.cli.predict --exp-config $(CONFIG) --exp-group-dir $(OUTPUT) --exp-suffix $(EXP_SUFFIX) --wav-dir $(WAV_DIR) --out-dir $(PRED_DIR)

evaluate:
	python -m salsa_tpu.cli.evaluate --output-dir $(OUTPUT_DIR) --gt-meta-root-dir $(GT_ROOT_DIR)

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py
