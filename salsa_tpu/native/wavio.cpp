// Fast RIFF/WAVE decoder for the salsa_tpu data loader.
//
// The reference stack decodes audio through librosa/soundfile; salsa_tpu's default
// reader is dependency-free Python (utils/audio_io.py). This C++ path decodes PCM
// 16/24/32-bit and float WAVs straight into a caller-provided channel-major float32
// buffer several times faster than the NumPy bit-fiddling fallback — it is the host
// side of the extraction pipeline, feeding waveforms to the on-chip feature kernels.
//
// Build: g++ -O3 -march=native -shared -fPIC wavio.cpp -o libwavio.so
// ABI: plain C, used from Python via ctypes (salsa_tpu/native/__init__.py).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct WavInfo {
    uint16_t format = 0;       // 1 = PCM, 3 = IEEE float (after EXTENSIBLE unwrap)
    uint16_t n_channels = 0;
    uint32_t sample_rate = 0;
    uint16_t bits = 0;
    uint16_t block_align = 0;
    long data_offset = -1;
    uint32_t data_bytes = 0;
};

bool parse_header(FILE* f, WavInfo* info) {
    uint8_t hdr[12];
    if (fread(hdr, 1, 12, f) != 12) return false;
    if (memcmp(hdr, "RIFF", 4) != 0 || memcmp(hdr + 8, "WAVE", 4) != 0) return false;
    uint8_t chunk[8];
    while (fread(chunk, 1, 8, f) == 8) {
        uint32_t size;
        memcpy(&size, chunk + 4, 4);
        if (memcmp(chunk, "fmt ", 4) == 0) {
            std::vector<uint8_t> fmt(size);
            if (fread(fmt.data(), 1, size, f) != size) return false;
            memcpy(&info->format, fmt.data(), 2);
            memcpy(&info->n_channels, fmt.data() + 2, 2);
            memcpy(&info->sample_rate, fmt.data() + 4, 4);
            memcpy(&info->block_align, fmt.data() + 12, 2);
            memcpy(&info->bits, fmt.data() + 14, 2);
            if (info->format == 0xFFFE && size >= 26) {  // WAVE_FORMAT_EXTENSIBLE
                memcpy(&info->format, fmt.data() + 24, 2);
            }
            if (size & 1) fseek(f, 1, SEEK_CUR);
        } else if (memcmp(chunk, "data", 4) == 0) {
            info->data_offset = ftell(f);
            info->data_bytes = size;
            fseek(f, size + (size & 1), SEEK_CUR);
        } else {
            fseek(f, size + (size & 1), SEEK_CUR);
        }
        if (info->data_offset >= 0 && info->format != 0) break;
    }
    return info->data_offset >= 0 && info->format != 0 && info->block_align > 0;
}

}  // namespace

extern "C" {

// Returns 0 on success. n_samples = frames per channel.
int wav_info(const char* path, int* n_channels, long* n_samples, int* sample_rate) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    WavInfo info;
    bool ok = parse_header(f, &info);
    fclose(f);
    if (!ok) return -2;
    *n_channels = info.n_channels;
    *n_samples = info.data_bytes / info.block_align;
    *sample_rate = (int)info.sample_rate;
    return 0;
}

// Decode into out[channel][sample] (channel-major, n_channels * n_samples floats).
// Returns 0 on success.
int wav_read_f32(const char* path, float* out, int n_channels, long n_samples) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    WavInfo info;
    if (!parse_header(f, &info) || info.n_channels != n_channels) {
        fclose(f);
        return -2;
    }
    long frames = info.data_bytes / info.block_align;
    if (frames > n_samples) frames = n_samples;
    fseek(f, info.data_offset, SEEK_SET);

    const int C = info.n_channels;
    const size_t CHUNK = 1 << 16;  // frames per read
    std::vector<uint8_t> buf(CHUNK * info.block_align);
    long done = 0;
    int rc = 0;

    while (done < frames) {
        size_t want = (size_t)((frames - done) < (long)CHUNK ? (frames - done) : CHUNK);
        size_t got = fread(buf.data(), info.block_align, want, f);
        if (got == 0) { rc = -3; break; }
        const uint8_t* p = buf.data();
        if (info.format == 1 && info.bits == 16) {
            const int16_t* s = (const int16_t*)p;
            for (size_t i = 0; i < got; ++i)
                for (int c = 0; c < C; ++c)
                    out[(size_t)c * n_samples + done + i] = s[i * C + c] * (1.0f / 32768.0f);
        } else if (info.format == 1 && info.bits == 24) {
            for (size_t i = 0; i < got; ++i) {
                const uint8_t* fr = p + i * info.block_align;
                for (int c = 0; c < C; ++c) {
                    const uint8_t* b = fr + c * 3;
                    int32_t v = (int32_t)(((uint32_t)b[0] << 8) | ((uint32_t)b[1] << 16) |
                                          ((uint32_t)b[2] << 24)) >> 8;
                    out[(size_t)c * n_samples + done + i] = v * (1.0f / 8388608.0f);
                }
            }
        } else if (info.format == 1 && info.bits == 32) {
            const int32_t* s = (const int32_t*)p;
            for (size_t i = 0; i < got; ++i)
                for (int c = 0; c < C; ++c)
                    out[(size_t)c * n_samples + done + i] =
                        s[i * C + c] * (1.0f / 2147483648.0f);
        } else if (info.format == 3 && info.bits == 32) {
            const float* s = (const float*)p;
            for (size_t i = 0; i < got; ++i)
                for (int c = 0; c < C; ++c)
                    out[(size_t)c * n_samples + done + i] = s[i * C + c];
        } else {
            rc = -4;
            break;
        }
        done += (long)got;
    }
    fclose(f);
    return rc;
}

}  // extern "C"
