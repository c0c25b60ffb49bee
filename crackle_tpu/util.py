"""File I/O helpers: save/load with transparent .gz/.xz handling and
format converters (reference parity: crackle/util.py). Converters for
formats whose libraries are not installed raise ImportError lazily."""
from typing import Optional, Union

import io
import mmap
import os
import gzip
import lzma

import numpy as np

from .array import CrackleArray, CrackleRemoteArray
from .codec import compress, decompress
from .headers import CrackleHeader


def normalize_file_ext(filename):
  filename, ext = os.path.splitext(filename)
  two_pass = ('.ckl', '.cpso')
  if ext in two_pass:
    return ext
  while True:
    filename, ext2 = os.path.splitext(filename)
    if ext2 in two_pass:
      return ext2
    elif ext2 == '':
      return ext
    ext = ext2


def _load(filelike, size: int = -1, allow_mmap: bool = False):
  if hasattr(filelike, 'read'):
    return filelike.read(size)
  if isinstance(filelike, str) and os.path.splitext(filelike)[1] == '.gz':
    with gzip.open(filelike, 'rb') as f:
      return f.read(size)
  if isinstance(filelike, str) and \
      os.path.splitext(filelike)[1] in ('.lzma', '.xz'):
    with lzma.open(filelike, 'rb') as f:
      return f.read(size)
  with open(filelike, 'rb') as f:
    if allow_mmap:
      return mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
    return f.read(size)


def load_header(filelike, **kwargs):
  """Load the header with minimal data reads."""
  binary = _load(filelike, CrackleHeader.HEADER_BYTES)
  return CrackleHeader.frombytes(binary, **kwargs)


def load_num_labels(filelike, **kwargs):
  """Load the number of labels with near-minimal data reads."""
  startpos = 0
  if hasattr(filelike, "tell"):
    startpos = filelike.tell()
  head = load_header(
    filelike, ignore_crc_check=kwargs.get("ignore_crc_check", False)
  )
  readlen = head.header_bytes + head.grid_index_bytes + 16
  if hasattr(filelike, "seek"):
    filelike.seek(startpos)
  binary = _load(filelike, readlen)
  from .codec import num_labels as _nl
  head2 = CrackleHeader.frombytes(binary)
  offset = head2.header_bytes + head2.grid_index_bytes
  if head2.label_format != 0:
    offset += head2.stored_data_width
  n = int.from_bytes(binary[offset:offset + 8], 'little')
  if head2.label_format != 0:
    n += 1
  return n


def rload(filelike, **kwargs):
  """Load the array using a memory-efficient remote interface."""
  return CrackleRemoteArray(filelike, **kwargs)


def aload(filelike, allow_mmap=False) -> CrackleArray:
  """Load a CrackleArray from a file."""
  return CrackleArray(_load(filelike, allow_mmap=allow_mmap))


def bload(filelike, allow_mmap=False) -> bytes:
  """Load the raw binary file."""
  return _load(filelike, allow_mmap=allow_mmap)


def load(filelike, label: Optional[int] = None,
         parallel: int = 0) -> np.ndarray:
  """Load and decompress an image from a file-like or path."""
  return decompress(_load(filelike), label=label, parallel=parallel)


def load_any(filename: str) -> np.ndarray:
  ext = normalize_file_ext(filename)
  if ext == ".ckl":
    image = aload(filename)
  elif ext == ".npy":
    image = load_numpy(filename)
  elif ext == ".nrrd":
    import nrrd
    image, _header = nrrd.read(filename)
    if image.shape[0] == 3 and image.ndim == 3:
      image = image[..., np.newaxis]
      image = np.transpose(image, axes=[1, 2, 3, 0])
    return image
  elif ext == ".nii":
    import nibabel as nib
    image = nib.load(filename)
    image = np.array(image.dataobj)
  elif ext in (".tif", ".tiff"):
    import tifffile
    image = tifffile.imread(filename)
  elif ext == ".cpso":
    import compresso
    image = compresso.load(filename)
  else:
    raise ValueError("Data type not supported: " + ext)
  return np.asfortranarray(image)


def load_numpy(filelike):
  f = io.BytesIO(_load(filelike))
  return np.load(f)


def save_numpy(arr: Union[np.ndarray, CrackleArray, bytes], filelike,
               block_size=int(200e6)):
  """Stream a crackle array to .npy in z-blocks without full decode."""
  if isinstance(arr, np.ndarray):
    np.save(filelike, arr)
    return
  if isinstance(arr, bytes):
    arr = CrackleArray(arr)

  if isinstance(filelike, str) and os.path.splitext(filelike)[1] == '.gz':
    f = gzip.open(filelike, 'wb')
  elif isinstance(filelike, str) and \
      os.path.splitext(filelike)[1] in ('.lzma', '.xz'):
    f = lzma.open(filelike, 'wb')
  elif isinstance(filelike, str):
    f = open(filelike, 'wb')
  else:
    f = filelike

  head = arr.header()
  data_width = head.data_width

  np.lib.format.write_array_header_2_0(f, {
    "descr": f"<u{data_width}",
    "fortran_order": head.fortran_order,
    "shape": arr.shape,
  })

  blocks = max(int(np.ceil(arr.nbytes / block_size)), 1)
  sz = arr.shape[2]
  sz_blocks = max(int(np.ceil(sz / blocks)), 1)
  num_z_blocks = max(int(np.ceil(sz / sz_blocks)), 1)
  order = "F" if head.fortran_order else "C"

  try:
    for z_block in range(num_z_blocks):
      start = z_block * sz_blocks
      end = min((z_block + 1) * sz_blocks, arr.shape[2])
      subarr = arr[:, :, start:end]
      f.write(subarr.tobytes(order))
  finally:
    if isinstance(filelike, str):
      f.close()


def _to_numpy(arr):
  if isinstance(arr, bytes):
    return decompress(arr)
  elif isinstance(arr, CrackleArray):
    return arr.decompress()
  return arr


def save_nii(arr, path: str, affine=None):
  """Save as NIfTI (.nii / .nii.gz)."""
  import nibabel as nib
  if affine is None:
    affine = np.eye(4)
  img = nib.Nifti1Image(_to_numpy(arr), affine)
  nib.save(img, path)


def save_nrrd(arr, path: str, compress: str = "raw"):
  """Save as NRRD."""
  import nrrd
  options = {'encoding': 'raw'}
  if compress == "gzip":
    options['encoding'] = 'gzip'
  elif compress == "bzip2":
    options['encoding'] = 'bz2'
  nrrd.write(path, _to_numpy(arr), options)


def save_tiff(arr, path: str, compression='zlib'):
  """Save as TIFF."""
  import tifffile
  tifffile.imwrite(path, _to_numpy(arr), compression=compression)


def save_compresso(arr, path: str):
  import compresso
  compresso.save(_to_numpy(arr), path)


def save(labels: Union[np.ndarray, CrackleArray], filelike, **kwargs):
  """Save labels to a file-like or path; converts by extension."""
  binary = None
  if isinstance(labels, CrackleArray):
    binary = labels.binary

  if isinstance(filelike, str):
    if (filelike.endswith(".npy") or filelike.endswith(".npy.gz")
        or filelike.endswith(".npy.xz") or filelike.endswith(".npy.lzma")):
      return save_numpy(binary if binary is not None else labels, filelike)
    elif filelike.endswith(".nrrd"):
      return save_nrrd(binary if binary is not None else labels, filelike)
    elif filelike.endswith(".tiff") or filelike.endswith(".tif"):
      return save_tiff(binary if binary is not None else labels, filelike)
    elif filelike.endswith(".cpso"):
      return save_compresso(binary if binary is not None else labels,
                            filelike)

  if isinstance(labels, np.ndarray):
    binary = compress(labels, **kwargs)

  if hasattr(filelike, 'write'):
    filelike.write(binary)
  elif isinstance(filelike, str) and \
      os.path.splitext(filelike)[1] == '.gz':
    with gzip.open(filelike, 'wb') as f:
      f.write(binary)
  elif isinstance(filelike, str) and \
      os.path.splitext(filelike)[1] in ('.lzma', '.xz'):
    with lzma.open(filelike, 'wb') as f:
      f.write(binary)
  else:
    with open(filelike, 'wb') as f:
      f.write(binary)
