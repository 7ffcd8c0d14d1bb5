"""Build the reference Rust CLI as a byte-identity oracle.

The sandbox has a Rust toolchain but no crates.io access, so the
reference's two dependencies are shimmed OFFLINE in a /tmp build copy
(the read-only checkout at /root/reference is never touched):

* ``thiserror`` → manual Display/Error impls with the exact same
  message strings (error.rs rewritten mechanically);
* ``flate2`` → a local crate FFI-wrapping the system libz
  (read::ZlibDecoder over a byte slice — the only surface used).

Neither shim changes extraction semantics; the binary's stdout is
compared byte-for-byte by tests/test_reference_binary.py.

Usage: python scripts/build_reference_oracle.py  → prints binary path
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

REF = "/root/reference"
BUILD = "/tmp/refbuild"
BIN = os.path.join(BUILD, "target", "release", "pdf-table")

FLATE2_CARGO = """[package]
name = "flate2"
version = "1.1.8"
edition = "2021"

[lib]
path = "src/lib.rs"
"""

FLATE2_LIB = r'''//! Offline build shim for the flate2 crate: zlib inflate via the
//! system libz (FFI), exposing only the surface the reference uses.

use std::io::{self, Read};
use std::os::raw::{c_int, c_uint, c_ulong};

#[repr(C)]
struct ZStream {
    next_in: *const u8,
    avail_in: c_uint,
    total_in: c_ulong,
    next_out: *mut u8,
    avail_out: c_uint,
    total_out: c_ulong,
    msg: *const u8,
    state: *mut u8,
    zalloc: *const u8,
    zfree: *const u8,
    opaque: *const u8,
    data_type: c_int,
    adler: c_ulong,
    reserved: c_ulong,
}

#[link(name = "z")]
extern "C" {
    fn inflateInit_(strm: *mut ZStream, version: *const u8, stream_size: c_int) -> c_int;
    fn inflate(strm: *mut ZStream, flush: c_int) -> c_int;
    fn inflateEnd(strm: *mut ZStream) -> c_int;
    fn zlibVersion() -> *const u8;
}

const Z_OK: c_int = 0;
const Z_STREAM_END: c_int = 1;
const Z_NO_FLUSH: c_int = 0;
const Z_BUF_ERROR: c_int = -5;

fn inflate_all(data: &[u8]) -> io::Result<Vec<u8>> {
    unsafe {
        let mut strm: ZStream = std::mem::zeroed();
        let rc = inflateInit_(
            &mut strm,
            zlibVersion(),
            std::mem::size_of::<ZStream>() as c_int,
        );
        if rc != Z_OK {
            return Err(io::Error::new(io::ErrorKind::Other, "inflateInit failed"));
        }
        let mut out = Vec::with_capacity(data.len().max(64) * 4);
        let mut buf = [0u8; 65536];
        strm.next_in = data.as_ptr();
        strm.avail_in = data.len() as c_uint;
        loop {
            strm.next_out = buf.as_mut_ptr();
            strm.avail_out = buf.len() as c_uint;
            let rc = inflate(&mut strm, Z_NO_FLUSH);
            let produced = buf.len() - strm.avail_out as usize;
            out.extend_from_slice(&buf[..produced]);
            match rc {
                Z_STREAM_END => break,
                Z_OK => continue,
                Z_BUF_ERROR if produced == 0 && strm.avail_in == 0 => {
                    inflateEnd(&mut strm);
                    return Err(io::Error::new(
                        io::ErrorKind::UnexpectedEof,
                        "corrupt deflate stream",
                    ));
                }
                Z_BUF_ERROR => continue,
                _ => {
                    inflateEnd(&mut strm);
                    return Err(io::Error::new(
                        io::ErrorKind::InvalidData,
                        format!("zlib inflate error {}", rc),
                    ));
                }
            }
        }
        inflateEnd(&mut strm);
        Ok(out)
    }
}

pub mod read {
    use super::*;

    pub struct ZlibDecoder<R> {
        inner: R,
        done: bool,
        out: Vec<u8>,
        pos: usize,
        err: Option<io::Error>,
    }

    impl<R: Read> ZlibDecoder<R> {
        pub fn new(inner: R) -> Self {
            ZlibDecoder { inner, done: false, out: Vec::new(), pos: 0, err: None }
        }

        fn ensure(&mut self) -> io::Result<()> {
            if !self.done {
                self.done = true;
                let mut raw = Vec::new();
                self.inner.read_to_end(&mut raw)?;
                match inflate_all(&raw) {
                    Ok(v) => self.out = v,
                    Err(e) => self.err = Some(e),
                }
            }
            if let Some(e) = self.err.take() {
                return Err(e);
            }
            Ok(())
        }
    }

    impl<R: Read> Read for ZlibDecoder<R> {
        fn read(&mut self, buf: &mut [u8]) -> io::Result<usize> {
            self.ensure()?;
            let n = (self.out.len() - self.pos).min(buf.len());
            buf[..n].copy_from_slice(&self.out[self.pos..self.pos + n]);
            self.pos += n;
            Ok(n)
        }
    }
}
'''

ERROR_RS = '''use std::fmt;

#[derive(Debug)]
pub enum PdfError {
    MissingHeader,
    MissingEof,
    Parse { position: usize, message: String },
    InvalidXref,
    ObjectNotFound(u32, u16),
    InvalidStructure(String),
    UnsupportedFilter(String),
    DecompressError(String),
    InvalidUtf8,
    Io(std::io::Error),
}

impl fmt::Display for PdfError {
    fn fmt(&self, f: &mut fmt::Formatter<'_>) -> fmt::Result {
        match self {
            PdfError::MissingHeader => write!(f, "Invalid PDF: missing %PDF header"),
            PdfError::MissingEof => write!(f, "Invalid PDF: missing %%EOF marker"),
            PdfError::Parse { position, message } => {
                write!(f, "Parse error at byte {}: {}", position, message)
            }
            PdfError::InvalidXref => write!(f, "Invalid xref table"),
            PdfError::ObjectNotFound(a, b) => write!(f, "Object not found: {} {} R", a, b),
            PdfError::InvalidStructure(s) => {
                write!(f, "Invalid document structure: {}", s)
            }
            PdfError::UnsupportedFilter(s) => write!(f, "Unsupported filter: {}", s),
            PdfError::DecompressError(s) => write!(f, "Decompression failed: {}", s),
            PdfError::InvalidUtf8 => write!(f, "Invalid UTF-8 in string"),
            PdfError::Io(e) => write!(f, "IO error: {}", e),
        }
    }
}

impl std::error::Error for PdfError {}

impl From<std::io::Error> for PdfError {
    fn from(e: std::io::Error) -> Self {
        PdfError::Io(e)
    }
}

pub type Result<T> = std::result::Result<T, PdfError>;
'''


def build() -> str | None:
    if os.path.exists(BIN):
        return BIN
    if shutil.which("cargo") is None or not os.path.isdir(REF):
        return None
    if os.path.exists(BUILD):
        shutil.rmtree(BUILD)
    shutil.copytree(REF, BUILD)
    shim = os.path.join(BUILD, "shims", "flate2")
    os.makedirs(os.path.join(shim, "src"), exist_ok=True)
    with open(os.path.join(shim, "Cargo.toml"), "w") as f:
        f.write(FLATE2_CARGO)
    with open(os.path.join(shim, "src", "lib.rs"), "w") as f:
        f.write(FLATE2_LIB)
    with open(os.path.join(BUILD, "src", "error.rs"), "w") as f:
        f.write(ERROR_RS)
    cargo_path = os.path.join(BUILD, "Cargo.toml")
    t = open(cargo_path).read()
    t = t.replace('flate2 = "1.1.8"', 'flate2 = { path = "shims/flate2" }')
    t = t.replace('thiserror = "2.0.18"', "")
    t = t.replace('wasm-bindgen = { version = "0.2", optional = true }\n', "")
    t = t.replace(
        "[target.'cfg(target_arch = \"wasm32\")'.dependencies]\n"
        'console_error_panic_hook = { version = "0.1", optional = true }\n',
        "",
    )
    t = t.replace(
        "[features]\ndefault = []\n"
        'wasm = ["dep:wasm-bindgen", "dep:console_error_panic_hook"]\n',
        "",
    )
    with open(cargo_path, "w") as f:
        f.write(t)
    r = subprocess.run(
        ["cargo", "build", "--release", "--offline"],
        cwd=BUILD,
        capture_output=True,
        text=True,
        timeout=600,
    )
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-3000:])
        return None
    return BIN if os.path.exists(BIN) else None


if __name__ == "__main__":
    path = build()
    if path is None:
        sys.exit("build failed or toolchain unavailable")
    print(path)
