"""Host-path breakdown: time each stage of the se pipeline separately."""
import io, os, time, tempfile
import numpy as np

from sickle_tpu.constants import Compat, QualityType
from sickle_tpu.engine import EngineConfig, run_se
from sickle_tpu.engine.chunker import iter_record_chunks
from sickle_tpu.io.fastq import PackWorkspace, OutputBuffer, pack_fastq, assemble_records
from sickle_tpu.ops import TrimParams
from sickle_tpu.ops.trim import BIG

params = TrimParams(qualtype=QualityType.SANGER, qual_threshold=60, length_threshold=20)

def fake_cuts(seq, qual, lengths):
    n = lengths.shape[0]
    return (np.zeros(n, np.int32), np.asarray(lengths, np.int32).copy(),
            np.full(n, BIG, np.int32))

fixture = open("/root/reference/test/test.fastq", "rb").read()
copies = 120
data = fixture * copies
n_reads = copies * 2500
print(f"{n_reads} reads, {len(data)/1e6:.0f} MB in memory")

# stage 1: chunker alone
for _ in range(2):
    t0 = time.perf_counter()
    chunks = list(iter_record_chunks(io.BytesIO(data), 1 << 16))
    t = time.perf_counter() - t0
print(f"chunker:   {t:.3f}s ({len(data)/t/1e6:.0f} MB/s)")

# stage 2: pack alone (warm ws)
ws = PackWorkspace(need_seq=False)
packed = [pack_fastq(c, workspace=ws, batch_multiple=1<<15, need_seq=False) for c in chunks[:1]]
t0 = time.perf_counter()
for c in chunks:
    p = pack_fastq(c, workspace=ws, batch_multiple=1<<15, need_seq=False)
t = time.perf_counter() - t0
print(f"pack:      {t:.3f}s ({n_reads/t/1e6:.2f} M reads/s)")

# stage 2b: count_nonzero invariant scan
t0 = time.perf_counter()
for c in chunks:
    pq = pack_fastq(c, workspace=ws, batch_multiple=1<<15, need_seq=False)
    np.count_nonzero(pq.qual)
t = time.perf_counter() - t0
print(f"pack+cnz:  {t:.3f}s")

# stage 3: assemble alone
outbuf = OutputBuffer()
t0 = time.perf_counter()
total_out = 0
for c in chunks:
    p = pack_fastq(c, workspace=ws, batch_multiple=1<<15, need_seq=False)
    n = p.n_records
    five = np.zeros(n, np.int64)
    three = p.lengths[:n].astype(np.int64)
    out = assemble_records(p.data, name_start=p.name_start, name_len=p.name_len,
        seq_start=p.seq_start, comment_start=p.comment_start,
        comment_len=p.comment_len, qual_start=p.qual_start,
        five=five, three=three, compat=Compat.FORK,
        qualtype=QualityType.SANGER, out=outbuf)
    total_out += len(out)
t = time.perf_counter() - t0
print(f"pack+asm:  {t:.3f}s ({total_out/1e6:.0f} MB out)")

# full pipeline from tempfile (includes read+write)
with tempfile.TemporaryDirectory() as td:
    src = os.path.join(td, "b.fastq")
    open(src, "wb").write(data)
    outp = os.path.join(td, "o.fastq")
    for trial in range(3):
        with open(src, "rb") as fin, open(outp, "wb") as fout:
            t0 = time.perf_counter()
            c = run_se(fin, fout, params, cfg=EngineConfig(records_per_chunk=1<<16),
                       cuts_fn=fake_cuts)
            t = time.perf_counter() - t0
        print(f"pipeline:  {t:.3f}s ({n_reads/t/1e6:.2f} M reads/s)")
