# Convenience targets (role parity with the reference's Makefile build +
# smoke-test targets, /root/reference/Makefile:51-62).  The package needs
# no build step; `native` prebuilds the C++ I/O fast path.

PYTHON ?= python
TESTDIR ?= /root/reference/test
OUT ?= test_output

.PHONY: all native test test_se test_pe test_pei bench clean

all: native

native:
	$(PYTHON) -c "from sickle_tpu.io import native; assert native.available(), 'g++ build failed'; print('native io ready:', native._SO)"

test:
	$(PYTHON) -m pytest tests/ -q

$(OUT):
	mkdir -p $(OUT)

test_se: | $(OUT)
	$(PYTHON) -m sickle_tpu se -f $(TESTDIR)/test.fastq -t sanger -q 60 \
	  -o $(OUT)/test.fastq.se.out > $(OUT)/test.se.txt
	cat $(OUT)/test.se.txt

test_pe: | $(OUT)
	$(PYTHON) -m sickle_tpu pe -t sanger -q 60 \
	  -f $(TESTDIR)/test.f.fastq -r $(TESTDIR)/test.r.fastq \
	  -o $(OUT)/test.fastq.pe1.out -p $(OUT)/test.fastq.pe2.out \
	  -s $(OUT)/test.fastq.pes.out > $(OUT)/test.pe.txt
	cat $(OUT)/test.pe.txt

test_pei: | $(OUT)
	$(PYTHON) -m sickle_tpu pe -t sanger -q 60 \
	  -c $(TESTDIR)/test.fastq -M $(OUT)/test.fastq.pei.out \
	  > $(OUT)/test.pei.txt
	cat $(OUT)/test.pei.txt

bench:
	$(PYTHON) bench.py

clean:
	rm -rf $(OUT) sickle_tpu/io/_build
