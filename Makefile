# Build/test entry points (the reference Makefile's role, Makefile:1-69 —
# its C binaries become Python entry points here; the only native build is
# the C++ block manager).

PY ?= python

.PHONY: all native fixtures test test-tpu bench infer train clean

all: native fixtures

# native C++ block manager (ctypes-loaded twin of the Python allocator)
native:
	$(MAKE) -C csrc

# offline golden fixtures (torch-CPU random-init oracle; no network)
fixtures:
	$(PY) tools/make_golden.py --tag tiny

# test suite on a virtual 8-device CPU mesh
test: fixtures
	$(PY) -m pytest tests/ -q

# test suite on the real chip
test-tpu: fixtures
	LLMC_TEST_TPU=1 $(PY) -m pytest tests/ -q

# headline benchmark (one JSON line, runs on the TPU)
bench:
	$(PY) bench.py

# demo decode (the reference's paged_infer binary role)
infer: fixtures
	$(PY) -m llmc_paged_tpu.engine.cli \
	  --checkpoint tests/fixtures/model_tiny.bin \
	  --tokenizer tests/fixtures/tokenizer_tiny.bin \
	  --data tests/fixtures/tokens_tiny.bin \
	  --mode paged --batch 4 --prompt-size 8 --max-new 32 --greedy

# demo training run (the reference's train_gpt2 binary role)
train: fixtures
	$(PY) -m llmc_paged_tpu.train --train-data tests/fixtures/tokens_tiny.bin \
	  --steps 10 --layers 2 --heads 2 --channels 32 --vocab 256

clean:
	$(MAKE) -C csrc clean
	rm -rf tests/fixtures
