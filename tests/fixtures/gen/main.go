// Golden-fixture generator for ringo_tpu's cross-implementation tests
// (tests/test_go_vectors.py).  This file must run INSIDE a checkout of the
// Go reference (github.com/sp301415/ringo-snark) because it imports the
// internal zp package:
//
//	git clone https://github.com/sp301415/ringo-snark
//	mkdir -p ringo-snark/cmd/genfixtures
//	cp main.go ringo-snark/cmd/genfixtures/
//	cd ringo-snark && go run ./cmd/genfixtures -out /path/to/tests/fixtures
//
// It writes the three binary fixtures described in tests/fixtures/README.md:
//
//	aes_ctr_stream.bin   — 4096 bytes of the seeded AES-CTR keystream
//	                       (math/csprng/uniform.go:38-54)
//	commit_key_head.bin  — first 64 uint64 SampleN draws of the CommitKey
//	                       In matrix, poly 0, in draw order
//	                       (jindo/entities.go:21-73), little-endian
//	challenge_stream.bin — first 256 bytes of the SHAKE128 evaluation
//	                       oracle seeded with CommitKey || zero commitment
//	                       || Marshal(x=1) (jindo/prover.go:220-225)
package main

import (
	"encoding/binary"
	"flag"
	"io"
	"os"
	"path/filepath"

	"github.com/sp301415/ringo-snark/jindo"
	"github.com/sp301415/ringo-snark/jindo/internal/zp"
	"github.com/sp301415/ringo-snark/math/csprng"
	"golang.org/x/crypto/sha3"
)

func seed32() []byte {
	s := make([]byte, 32)
	copy(s, []byte("Jindo!"))
	return s
}

func must(err error) {
	if err != nil {
		panic(err)
	}
}

func write(dir, name string, data []byte) {
	must(os.WriteFile(filepath.Join(dir, name), data, 0o644))
}

func main() {
	out := flag.String("out", ".", "output directory")
	flag.Parse()

	// 1. raw AES-CTR keystream
	s := csprng.NewUniformSamplerWithSeed(seed32())
	buf := make([]byte, 4096)
	_, err := io.ReadFull(s, buf)
	must(err)
	write(*out, "aes_ctr_stream.bin", buf)

	// 2. CommitKey head: replay the exact SampleN draw order of
	// NewCommitKey (k-major, level-minor over ringQ moduli for In[0][0])
	params := jindo.NewParameters[*zp.Uint](1<<10, 1)
	u := csprng.NewUniformSamplerWithSeed(seed32())
	head := make([]byte, 0, 64*8)
	draws := 0
	for k := 0; draws < 64; k++ {
		for l := 0; l < params.RingQ().ModuliChainLength() && draws < 64; l++ {
			v := u.SampleN(params.RingQ().SubRings[l].Modulus)
			head = binary.LittleEndian.AppendUint64(head, v)
			draws++
		}
	}
	write(*out, "commit_key_head.bin", head)

	// 3. evaluation-oracle stream: CommitKey || zero commitment || x=1
	ck := jindo.NewCommitKey(params, seed32())
	oracle := sha3.NewSHAKE128()
	ck.WriteRawTo(oracle)
	com := jindo.NewCommitment(params)
	com.WriteRawTo(oracle)
	x := zp.NewUint(1)
	oracle.Write(x.Marshal())
	stream := make([]byte, 256)
	_, err = io.ReadFull(oracle, stream)
	must(err)
	write(*out, "challenge_stream.bin", stream)
}
