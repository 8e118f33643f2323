"""URI-dispatching path abstraction (reference: embodied/core/path.py:8-207).

``Path('...')`` dispatches on the URI scheme: local filesystems are served by
``LocalPath``; ``gs://`` (and other fsspec-supported remotes) by
``FSSpecPath`` when fsspec/gcsfs is importable — the TPU-native replacement
for the reference's tf.io.gfile backend. Registration is open: call
``Path.register(scheme, cls)``.
"""

import contextlib
import glob as globlib
import os
import re
import shutil


class Path:

  filesystems = []  # List of (regex, cls) pairs, first match wins.

  def __new__(cls, path):
    if cls is not Path:
      return super().__new__(cls)
    path = str(path)
    for pattern, impl in cls.filesystems:
      if re.match(pattern, path):
        obj = super().__new__(impl)
        obj.__init__(path)
        return obj
    raise NotImplementedError(f'No filesystem supports: {path}')

  @classmethod
  def register(cls, pattern, impl):
    cls.filesystems.insert(0, (pattern, impl))

  def __getnewargs__(self):
    return (self._path,)

  def __init__(self, path):
    assert isinstance(path, str)
    path = re.sub(r'^\./*', '', path)  # Remove leading dot or dot slashes.
    path = re.sub(r'(?<=[^/])/$', '', path)  # Remove single trailing slash.
    path = path or '.'  # Empty path is represented by a dot.
    self._path = path

  def __truediv__(self, part):
    sep = '' if self._path.endswith('/') else '/'
    return type(self)(f'{self._path}{sep}{str(part)}')

  def __repr__(self):
    return f'Path({str(self)})'

  def __fspath__(self):
    return str(self)

  def __eq__(self, other):
    return self._path == other._path

  def __lt__(self, other):
    return self._path < other._path

  def __hash__(self):
    return hash(self._path)

  def __str__(self):
    return self._path

  @property
  def parent(self):
    if '/' not in self._path:
      return type(self)('.')
    parent = self._path.rsplit('/', 1)[0]
    return type(self)(parent or '/')

  @property
  def name(self):
    if '/' not in self._path:
      return self._path
    return self._path.rsplit('/', 1)[1]

  @property
  def stem(self):
    return self.name.split('.', 1)[0] if '.' in self.name else self.name

  @property
  def suffix(self):
    if '.' in self.name:
      return '.' + self.name.rsplit('.', 1)[1]
    return ''

  def read(self, mode='r'):
    assert mode in 'r rb'.split(), mode
    with self.open(mode) as f:
      return f.read()

  def read_text(self):
    return self.read('r')

  def read_bytes(self):
    return self.read('rb')

  def write(self, content, mode='w'):
    assert mode in 'w a wb ab'.split(), mode
    with self.open(mode) as f:
      f.write(content)

  def open(self, mode='r'):
    raise NotImplementedError

  def absolute(self):
    raise NotImplementedError

  def glob(self, pattern):
    raise NotImplementedError

  def exists(self):
    raise NotImplementedError

  def isfile(self):
    raise NotImplementedError

  def isdir(self):
    raise NotImplementedError

  def mkdirs(self):
    raise NotImplementedError

  def remove(self):
    raise NotImplementedError

  def rmtree(self):
    raise NotImplementedError

  def copy(self, dest):
    raise NotImplementedError


class LocalPath(Path):

  def __init__(self, path):
    super().__init__(os.path.expanduser(str(path)))

  @contextlib.contextmanager
  def open(self, mode='r'):
    with open(str(self), mode=mode) as f:
      yield f

  def absolute(self):
    return type(self)(os.path.abspath(str(self)))

  def glob(self, pattern):
    for path in globlib.glob(f'{str(self)}/{pattern}'):
      yield type(self)(path)

  def exists(self):
    return os.path.exists(str(self))

  def isfile(self):
    return os.path.isfile(str(self))

  def isdir(self):
    return os.path.isdir(str(self))

  def mkdirs(self):
    os.makedirs(str(self), exist_ok=True)

  def remove(self):
    os.remove(str(self))

  def rmtree(self):
    shutil.rmtree(str(self))

  def copy(self, dest):
    if self.isfile():
      shutil.copy(str(self), str(dest))
    else:
      shutil.copytree(str(self), str(dest), dirs_exist_ok=True)


class FSSpecPath(Path):
  """Remote path backed by fsspec, e.g. gs:// GCS buckets for TPU VM runs."""

  def __init__(self, path):
    super().__init__(str(path))
    import fsspec
    self._fs = fsspec.filesystem(self._path.split('://', 1)[0])

  @contextlib.contextmanager
  def open(self, mode='r'):
    with self._fs.open(str(self), mode) as f:
      yield f

  def absolute(self):
    return self

  def glob(self, pattern):
    for path in self._fs.glob(f'{str(self)}/{pattern}'):
      scheme = self._path.split('://', 1)[0]
      yield type(self)(f'{scheme}://{path}')

  def exists(self):
    return self._fs.exists(str(self))

  def isfile(self):
    return self._fs.isfile(str(self))

  def isdir(self):
    return self._fs.isdir(str(self))

  def mkdirs(self):
    self._fs.makedirs(str(self), exist_ok=True)

  def remove(self):
    self._fs.rm(str(self))

  def rmtree(self):
    self._fs.rm(str(self), recursive=True)

  def copy(self, dest):
    self._fs.copy(str(self), str(dest), recursive=True)


Path.register(r'.*', LocalPath)
try:
  import fsspec  # noqa: F401
  Path.register(r'^(gs|s3|az)://', FSSpecPath)
except ImportError:
  pass
