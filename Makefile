.PHONY: test tpu-test native bench graft-check sweep clean

test:
	python -m pytest tests/ -q

# hardware-only suite: compiled Mosaic kernels + on-chip PRNG statistics
# (skipped automatically by `make test`, which pins jax to CPU)
tpu-test:
	VIMO_TPU_TESTS=1 python -m pytest tests/test_pallas_tpu.py -q

native:
	$(MAKE) -C native

bench:
	python bench.py

# full 21-config Table-2 sweep on the two-factor synthetic corpus (~7 min
# CPU — SWEEP.json wall_s: 422; 20 epochs so the fused modes converge to
# the Table-2 ordering); rewrites the committed SWEEP.json artifact
sweep:
	python tools/run_table2_sweep.py --out SWEEP.json

# Table-2 fusion contrast at the FULL flagship geometry (d512/8h/4L) on
# the chip (~45 min incl. tunnel compiles); rewrites SWEEP_FULLGEOM.json
fullgeom:
	python tools/run_table2_fullgeom.py --out SWEEP_FULLGEOM.json

# peak-HBM measurement: student step dense vs grad-accum on the chip;
# rewrites MEMBENCH.json (feeds docs/SCALING.md "Batches bigger than HBM")
membench:
	python tools/bench_memory.py --out MEMBENCH.json

graft-check:
	python __graft_entry__.py
	# bare call, exactly as the driver makes it — dryrun self-bootstraps the
	# 8-virtual-CPU platform in a subprocess when this process lacks 8 devices
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
