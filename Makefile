# Convenience targets (reference parity: Makefile:34-65 of biiiipy/JaxMARL-HFT,
# minus docker — this package runs directly on the host TPU VM).
PY ?= python

# PYTHONPATH= drops the axon TPU plugin (it lives on PYTHONPATH), so test
# runs never touch the TPU tunnel and can run concurrently with on-chip work.
# The DEFAULT path is per-file process isolation: each test file runs in its
# own interpreter (2 at a time), so the XLA:CPU segfault-after-~40-compiles
# workaround in tests/conftest.py is belt-and-braces, not load-bearing
test: test-isolated

# longest files first so the 2 workers stay balanced (a long tail file
# starting last would serialise the end of the run)
SLOW_TESTS := tests/test_agent_spaces.py tests/test_env_vs_reference_matrix.py \
	tests/test_engine_vs_reference.py tests/test_ippo.py \
	tests/test_env_vs_reference_live.py tests/test_multihost.py \
	tests/test_engine_psort.py tests/test_sweep.py

test-isolated:
	{ printf '%s\n' $(SLOW_TESTS); ls tests/test_*.py | grep -vxF -e "$$(printf '%s\n' $(SLOW_TESTS))"; } \
		| PYTHONPATH= JAX_PLATFORMS=cpu xargs -P 2 -n 1 \
		$(PY) -m pytest -q --no-header

# single-process run (relies on the conftest cache-clear fixture)
test-one-process:
	PYTHONPATH= JAX_PLATFORMS=cpu $(PY) -m pytest tests/ -q

# build the native C++ CSV parser shared library (also auto-built on first
# use by jaxmarl_hft_tpu/data/native_csv.py)
native:
	$(PY) -c "from jaxmarl_hft_tpu.data import native_csv; \
		print(native_csv.build(force=True))"

test-fast:
	$(PY) -m pytest tests/test_engine_golden.py tests/test_book_and_misc.py \
		tests/test_data_and_config.py -q

bench:
	$(PY) bench.py

speed-test:
	$(PY) scripts/speed_test.py

ppo-2player:
	$(PY) scripts/train.py --env-config configs/2_player_fq_fqc_synth.json \
		--rl-config configs/ippo_2player.yaml

ppo-exec:
	$(PY) scripts/train.py --env-config configs/exec_longrun_fixed_quants_complex_synth.json \
		--rl-config configs/ippo_exec_fqc.yaml

ppo-mm:
	$(PY) scripts/train.py --env-config configs/mm_debug_fixed_quant_synth.json \
		--rl-config configs/ippo_mm_fq.yaml

baseline-eval:
	$(PY) scripts/evaluate.py --env-config configs/2_player_fq_fqc_synth.json

plot:
	$(PY) scripts/plots.py

scaling:
	$(PY) scripts/scaling_test.py

# full trainer under a real 2-process jax.distributed mesh (CPU/Gloo),
# checked bit-identical to single-process (the TPU-pod DCN code path)
multihost-smoke:
	$(PY) scripts/multihost_smoke.py --nprocs 2 --devices-per-proc 4

.PHONY: test test-isolated test-one-process native test-fast bench \
	speed-test ppo-2player ppo-exec ppo-mm baseline-eval plot scaling \
	multihost-smoke
