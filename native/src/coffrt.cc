// Runtime support for executing MSVC x64 COFF objects on Linux.
//
// The reference's AAC path links a prebuilt fdk-aac library that ships only
// as a Windows COFF archive (dep_codecs/lib/fdk-aac_x64.lib) — there is no
// Linux build in this environment, so the reference player itself has no
// AAC here. To obtain an executable AAC oracle (encoder for test vectors +
// decoder golden) we link those COFF objects ourselves: the Python side
// (iamf_tpu/codecs/aac/coff.py) parses the archive, lays out sections into
// the RWX region allocated here, applies AMD64 relocations, and resolves
// the ~35 CRT externals against the ms_abi shims below. This file provides:
//   - an RWX region allocator (thunks for far calls live in-region)
//   - the CRT shim table (libc forwarders compiled with __attribute__
//     ((ms_abi)) so MSVC-compiled code can call them directly)
//   - SysV<->ms_abi call bridges for the fdk-aac public API
//
// Dual-ABI note: everything the COFF code calls or is called through must
// be ms_abi; the extern "C" iamf_coff_* entry points are normal SysV for
// ctypes.

#include <cmath>
#include <cstdarg>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <sys/mman.h>

#define MSABI __attribute__((ms_abi))

extern "C" {

// ---- region ------------------------------------------------------------

void* iamf_coff_alloc(size_t size) {
  // MAP_32BIT keeps the region in the low 2 GB so IMAGE_REL_AMD64_ADDR32
  // and intra-region REL32 relocations always fit
  void* p = mmap(nullptr, size, PROT_READ | PROT_WRITE | PROT_EXEC,
                 MAP_PRIVATE | MAP_ANONYMOUS | MAP_32BIT, -1, 0);
  if (p == MAP_FAILED)
    p = mmap(nullptr, size, PROT_READ | PROT_WRITE | PROT_EXEC,
             MAP_PRIVATE | MAP_ANONYMOUS, -1, 0);
  return p == MAP_FAILED ? nullptr : p;
}

// ---- CRT shims (ms_abi) --------------------------------------------------

static MSABI void* sh_memcpy(void* d, const void* s, size_t n) {
  return memcpy(d, s, n);
}
static MSABI void* sh_memset(void* d, int c, size_t n) {
  return memset(d, c, n);
}
static MSABI void* sh_memmove(void* d, const void* s, size_t n) {
  return memmove(d, s, n);
}
static MSABI int sh_memcmp(const void* a, const void* b, size_t n) {
  return memcmp(a, b, n);
}
static MSABI void* sh_malloc(size_t n) { return malloc(n); }
static MSABI void sh_free(void* p) { free(p); }
static MSABI void* sh_calloc(size_t n, size_t s) { return calloc(n, s); }
static MSABI char* sh_strchr(char* s, int c) { return strchr(s, c); }
static MSABI int sh_strncmp(const char* a, const char* b, size_t n) {
  return strncmp(a, b, n);
}
static MSABI char* sh_strncpy(char* d, const char* s, size_t n) {
  return strncpy(d, s, n);
}
static MSABI char* sh_strstr(char* h, const char* n) { return strstr(h, n); }
static MSABI double sh_sqrt(double x) { return sqrt(x); }
static MSABI double sh_frexp(double x, int* e) { return frexp(x, e); }
static MSABI double sh_ldexp(double x, int e) { return ldexp(x, e); }
static MSABI FILE* sh_fopen(const char* p, const char* m) {
  return fopen(p, m);
}
static MSABI int sh_fclose(FILE* f) { return fclose(f); }
static MSABI size_t sh_fread(void* p, size_t s, size_t n, FILE* f) {
  return fread(p, s, n, f);
}
static MSABI size_t sh_fwrite(const void* p, size_t s, size_t n, FILE* f) {
  return fwrite(p, s, n, f);
}
static MSABI int sh_fseek(FILE* f, long o, int w) { return fseek(f, o, w); }
static MSABI long sh_ftell(FILE* f) { return ftell(f); }
static MSABI int sh_fflush(FILE* f) { return f ? fflush(f) : 0; }
static MSABI int sh_feof(FILE* f) { return feof(f); }
static MSABI char* sh_fgets(char* s, int n, FILE* f) { return fgets(s, n, f); }
static MSABI int sh_getchar(void) { return -1; }
static MSABI void sh_wassert(const wchar_t*, const wchar_t*, unsigned) {
  fprintf(stderr, "[coffrt] _wassert hit\n");
  abort();
}
static MSABI FILE* sh_acrt_iob_func(unsigned idx) {
  return idx == 0 ? stdin : idx == 1 ? stdout : stderr;
}
// fdk only logs via these; swallowing them is safe
static MSABI int sh_stdio_common_vfprintf(uint64_t, FILE*, const char*, void*,
                                          void*) {
  return 0;
}
static MSABI int sh_stdio_common_vsprintf(uint64_t, char* buf, size_t len,
                                          const char*, void*, void*) {
  if (buf && len) buf[0] = 0;
  return 0;
}
static MSABI void sh_security_check_cookie(uintptr_t) {}
static MSABI void sh_gshandlercheck(void) {}

// __chkstk receives the allocation size in RAX and must preserve all
// registers; Linux stacks are large enough that probing is unnecessary.
__asm__(
    ".globl iamf_coff_chkstk\n"
    "iamf_coff_chkstk:\n"
    "  ret\n");
extern "C" void iamf_coff_chkstk(void);

static uint64_t g_security_cookie = 0x00002B992DDFA232ULL;
static int g_fltused = 1;
static int g_isa_available = 0;  // force baseline (SSE2) code paths

struct ShimEntry {
  const char* name;
  void* addr;
};

static const ShimEntry g_shims[] = {
    {"memcpy", (void*)sh_memcpy},
    {"memset", (void*)sh_memset},
    {"memmove", (void*)sh_memmove},
    {"memcmp", (void*)sh_memcmp},
    {"malloc", (void*)sh_malloc},
    {"free", (void*)sh_free},
    {"calloc", (void*)sh_calloc},
    {"strchr", (void*)sh_strchr},
    {"strncmp", (void*)sh_strncmp},
    {"strncpy", (void*)sh_strncpy},
    {"strstr", (void*)sh_strstr},
    {"sqrt", (void*)sh_sqrt},
    {"frexp", (void*)sh_frexp},
    {"ldexp", (void*)sh_ldexp},
    {"fopen", (void*)sh_fopen},
    {"fclose", (void*)sh_fclose},
    {"fread", (void*)sh_fread},
    {"fwrite", (void*)sh_fwrite},
    {"fseek", (void*)sh_fseek},
    {"ftell", (void*)sh_ftell},
    {"fflush", (void*)sh_fflush},
    {"feof", (void*)sh_feof},
    {"fgets", (void*)sh_fgets},
    {"getchar", (void*)sh_getchar},
    {"_wassert", (void*)sh_wassert},
    {"__acrt_iob_func", (void*)sh_acrt_iob_func},
    {"__stdio_common_vfprintf", (void*)sh_stdio_common_vfprintf},
    {"__stdio_common_vsprintf", (void*)sh_stdio_common_vsprintf},
    {"__security_check_cookie", (void*)sh_security_check_cookie},
    {"__GSHandlerCheck", (void*)sh_gshandlercheck},
    {"__chkstk", (void*)iamf_coff_chkstk},
    {"__security_cookie", (void*)&g_security_cookie},
    {"_fltused", (void*)&g_fltused},
    {"__isa_available", (void*)&g_isa_available},
};

void* iamf_coff_shim(const char* name) {
  for (const auto& s : g_shims)
    if (!strcmp(s.name, name)) return s.addr;
  return nullptr;
}

// ---- generic ms_abi call bridges ----------------------------------------
// fdk's public API only uses integer/pointer args; a single variadic-width
// bridge per arity keeps the Python side simple (args passed as uint64).

typedef uint64_t(MSABI* ms_fn0)(void);
typedef uint64_t(MSABI* ms_fn1)(uint64_t);
typedef uint64_t(MSABI* ms_fn2)(uint64_t, uint64_t);
typedef uint64_t(MSABI* ms_fn3)(uint64_t, uint64_t, uint64_t);
typedef uint64_t(MSABI* ms_fn4)(uint64_t, uint64_t, uint64_t, uint64_t);
typedef uint64_t(MSABI* ms_fn5)(uint64_t, uint64_t, uint64_t, uint64_t,
                                uint64_t);

uint64_t iamf_coff_call(void* fn, int nargs, const uint64_t* a) {
  switch (nargs) {
    case 0: return ((ms_fn0)fn)();
    case 1: return ((ms_fn1)fn)(a[0]);
    case 2: return ((ms_fn2)fn)(a[0], a[1]);
    case 3: return ((ms_fn3)fn)(a[0], a[1], a[2]);
    case 4: return ((ms_fn4)fn)(a[0], a[1], a[2], a[3]);
    case 5: return ((ms_fn5)fn)(a[0], a[1], a[2], a[3], a[4]);
  }
  return (uint64_t)-1;
}
}  // extern "C"
